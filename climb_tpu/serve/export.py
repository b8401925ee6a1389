"""AOT serving artifacts: a trained forward as one portable StableHLO file.

The reference has no serving story at all — evaluation lives inside each
task trainer's loop and every consumer needs the full modeling stack plus a
checkpoint (reference train_snli_ve.py:246-266, vilt.py:481-514). This module
goes beyond it with the TPU-native equivalent of a saved-model: the jitted
eval step (device-side uint8 normalization, bf16/int8 compute, metric
reduction — everything under the jit) is lowered once with ``jax.export`` for
a fixed batch signature and serialized TOGETHER with the trained parameters
into a single msgpack file. Serving then needs only jax + this file:

- no model code, no flax module, no checkpoint surgery at serve time;
- lowered for ``platforms=('tpu', 'cpu')`` by default, so the same artifact
  runs on a TPU pod and on a CPU fallback box;
- closure constants are baked in: an ``int8_static`` export carries its PTQ
  calibration scales inside the program;
- the input signature travels in the artifact and is validated per call with
  actionable errors (serving bugs surface as shape messages, not XLA traces).

Produced by ``climb_tpu.cli.predict --export_model PATH`` and consumed either
by ``predict --from_export PATH`` or directly via :class:`ExportedModel`.
"""

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np
from flax import serialization

try:  # jax >= 0.4.30 style
    from jax import export as jax_export
except ImportError:  # pragma: no cover - older jax
    from jax.experimental import export as jax_export

logger = logging.getLogger(__name__)

FORMAT_VERSION = 1


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def _spec_tree(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), tree
    )


def pick_from_ladder(ladder: Sequence[int], n: int) -> int:
    """Smallest ladder batch size holding ``n`` examples (the largest when
    ``n`` exceeds every size — callers split). Shared by ExportedModel and
    the HTTP batcher so the routing rule cannot drift."""
    for bs in ladder:
        if n <= bs:
            return bs
    return ladder[-1]


# The canvas-width axis of 'pixel_values': (..., H, W, C) for both single-
# image (B, H, W, C) and image-pair (B, 2, H, W, C) layouts.
WIDTH_AXIS = -2


def _variant_specs(host_batch: dict, bs: int, width: Optional[int]) -> dict:
    """ShapeDtypeStructs for one (batch_size, canvas_width) program variant."""
    specs = {}
    for k, v in host_batch.items():
        shape = (bs,) + np.shape(v)[1:]
        if k == "pixel_values" and width is not None:
            shape = list(shape)
            shape[WIDTH_AXIS] = width
            shape = tuple(shape)
        specs[k] = jax.ShapeDtypeStruct(shape, np.asarray(v).dtype)
    return specs


def export_eval_step(
    eval_step,
    params,
    batch: dict,
    path: str,
    meta: dict,
    platforms: Sequence[str] = ("tpu", "cpu"),
    batch_sizes: Optional[Sequence[int]] = None,
    canvas_widths: Optional[Sequence[int]] = None,
) -> dict:
    """Serialize ``eval_step(params, batch)`` + params into one file.

    ``eval_step`` must be a ``jax.jit``-wrapped function of exactly
    ``(params, batch)`` (what ``train_step.make_eval_step`` returns);
    ``batch`` is a concrete example batch fixing the serving signature.
    ``meta`` carries the processing config a parameter-free server needs
    (canvas size, text length, head spec, tokenizer name, ...). Returns the
    stored metadata dict (with the signature fields added).

    Two optional program LADDERS (the cross product is exported):

    - ``batch_sizes``: one program per size (each <= the signature batch);
      the server pads a coalesced batch only to the smallest program that
      fits it — a lightly loaded server stops paying full-batch MXU time
      to answer one instance.
    - ``canvas_widths``: one program per pixel-canvas width (each a
      patch-size multiple <= the signature width) — the serving analog of
      training-time aspect bucketing: a batch of 4:3 photos runs at 512
      wide instead of paying the 640-canvas padding FLOPs. Results are
      identical (padding patches are masked out of attention either way;
      the model derives its grid from the traced pixel shape).
    """
    host_params = _to_host(params)
    host_batch = _to_host(batch)
    sig_bs = int(np.shape(next(iter(host_batch.values())))[0])
    sizes = sorted({int(b) for b in (batch_sizes or ())} | {sig_bs})
    if sizes[-1] > sig_bs:
        raise ValueError(
            f"ladder batch sizes {sizes} exceed the signature batch {sig_bs}"
        )
    if canvas_widths and "pixel_values" not in host_batch:
        raise ValueError("canvas_widths ladder needs a 'pixel_values' input")
    sig_w = (
        int(np.shape(host_batch["pixel_values"])[WIDTH_AXIS])
        if "pixel_values" in host_batch else None
    )
    widths = (
        sorted({int(w) for w in (canvas_widths or ())} | {sig_w})
        if sig_w is not None else [None]
    )
    if sig_w is not None:
        patch = int(meta.get("patch_size", 0) or 0)
        bad = [w for w in widths if w > sig_w or w <= 0
               or (patch and w % patch)]
        if bad:
            raise ValueError(
                f"canvas widths {bad} invalid: each must be a positive "
                f"patch-size ({patch}) multiple <= the signature width {sig_w}"
            )
    param_specs = _spec_tree(host_params)
    programs = {
        (bs, w): bytes(
            jax_export.export(eval_step, platforms=list(platforms))(
                param_specs, _variant_specs(host_batch, bs, w)
            ).serialize()
        )
        for bs in sizes
        for w in widths
    }
    meta = dict(meta)
    meta["format_version"] = FORMAT_VERSION
    meta["jax_version"] = jax.__version__
    meta["platforms"] = list(platforms)
    meta["batch_sizes"] = sizes
    if sig_w is not None:
        meta["canvas_widths"] = widths
    meta["batch_spec"] = {
        k: [list(np.shape(v)), np.asarray(v).dtype.name]
        for k, v in host_batch.items()
    }
    sig_key = (sig_bs, widths[-1])
    payload = {
        "stablehlo": programs[sig_key],
        # ladder programs besides the full signature (absent for single-
        # variant exports, keeping those artifacts byte-identical in layout)
        "stablehlo_variants": {
            f"{bs}:{w if w is not None else ''}": p
            for (bs, w), p in programs.items()
            if (bs, w) != sig_key
        },
        "params": serialization.to_state_dict(host_params),
        "meta": meta,
    }
    if not payload["stablehlo_variants"]:
        payload.pop("stablehlo_variants")
    blob = serialization.msgpack_serialize(payload)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    logger.info(
        "Exported %s eval step (%d params tensors, platforms=%s, %d bytes) -> %s",
        meta.get("task_key"), len(jax.tree_util.tree_leaves(host_params)),
        ",".join(platforms), len(blob), path,
    )
    return meta


class ExportedModel:
    """Serve a :func:`export_eval_step` artifact.

    ``__call__(batch)`` runs the embedded program with the embedded
    parameters and returns whatever the exported eval step returned
    (``(logits, metric_sum, metric_count)`` for predict exports). The batch
    must match the exported signature; key/shape/dtype mismatches raise
    ``ValueError`` with the expected signature spelled out.
    """

    def __init__(self, path: str):
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        meta = payload["meta"]
        version = int(meta.get("format_version", -1))
        if version != FORMAT_VERSION:
            raise ValueError(
                f"{path}: artifact format_version {version} != supported "
                f"{FORMAT_VERSION} (re-export with this climb_tpu)"
            )
        self.meta = meta
        self.params = payload["params"]
        self.batch_spec = {
            k: (tuple(shape), dtype)
            for k, (shape, dtype) in meta["batch_spec"].items()
        }
        sig_bs = next(iter(self.batch_spec.values()))[0][0]
        px = self.batch_spec.get("pixel_values")
        sig_w = px[0][WIDTH_AXIS] if px is not None else None
        self._programs = {
            (sig_bs, sig_w): jax_export.deserialize(
                bytearray(payload["stablehlo"])
            )
        }
        for key, blob in (payload.get("stablehlo_variants") or {}).items():
            bs_s, w_s = key.split(":")
            self._programs[(int(bs_s), int(w_s) if w_s else None)] = (
                jax_export.deserialize(bytearray(blob))
            )
        # pre-width-ladder artifacts (same format_version) stored batch-size
        # ladder programs under 'stablehlo_by_bs' at the signature width
        for bs_s, blob in (payload.get("stablehlo_by_bs") or {}).items():
            self._programs[(int(bs_s), sig_w)] = (
                jax_export.deserialize(bytearray(blob))
            )
        self.batch_sizes = tuple(sorted({bs for bs, _ in self._programs}))
        self.canvas_widths = tuple(
            sorted({w for _, w in self._programs if w is not None})
        ) or None
        self._exported = self._programs[(sig_bs, sig_w)]
        # Serving-path caching: Exported.call builds a FRESH traced call on
        # every invocation (measured ~9 s/call through a remote TPU backend:
        # retrace + executable reload + a full params re-upload each time).
        # Wrap each program's call in one jax.jit and keep params as device
        # arrays, so steady-state serving is a single cached dispatch.
        self._jit_calls = {
            key: jax.jit(p.call) for key, p in self._programs.items()
        }
        self._device_params = None

    @property
    def platforms(self):
        return tuple(self.meta["platforms"])

    def pick_batch_size(self, n: int) -> int:
        """Smallest ladder program that holds ``n`` examples (the largest
        program when ``n`` exceeds every ladder size — callers split)."""
        return pick_from_ladder(self.batch_sizes, n)

    def pick_canvas_width(self, needed_w: int) -> Optional[int]:
        """Smallest width-ladder program whose canvas holds ``needed_w``
        valid pixel columns (the widest when nothing fits or no ladder)."""
        if self.canvas_widths is None:
            return None
        return pick_from_ladder(self.canvas_widths, needed_w)

    def validate_batch(self, batch: dict) -> dict:
        """Check keys/shapes/dtypes against the exported signature.

        Extra keys are dropped (dataset loaders may attach side fields the
        export never consumed); missing keys or mismatched shapes raise.
        The leading (batch) dim may be any ladder size (``batch_sizes``),
        and the pixel canvas width any width-ladder size (``canvas_widths``).
        """
        missing = sorted(set(self.batch_spec) - set(batch))
        if missing:
            raise ValueError(
                f"exported model input(s) missing from batch: {missing}; "
                f"expected signature: {self._signature_str()}"
            )
        got_bs = {tuple(np.shape(batch[k]))[:1] for k in self.batch_spec}
        if len(got_bs) != 1 or next(iter(got_bs))[0] not in self.batch_sizes:
            raise ValueError(
                f"batch size(s) {sorted(b[0] for b in got_bs)} not in the "
                f"artifact's program ladder {list(self.batch_sizes)} "
                f"(fixed-shape serving; pad to a ladder size or re-export)"
            )
        out = {}
        for k, (shape, dtype) in self.batch_spec.items():
            v = batch[k]
            got_shape = tuple(np.shape(v))
            got_dtype = np.asarray(v).dtype.name if not hasattr(v, "dtype") else v.dtype.name
            want_trailing = list(shape[1:])
            got_trailing = list(got_shape[1:])
            if k == "pixel_values" and self.canvas_widths is not None:
                if got_trailing and got_trailing[WIDTH_AXIS] in self.canvas_widths:
                    want_trailing[WIDTH_AXIS] = got_trailing[WIDTH_AXIS]
            if got_trailing != want_trailing or got_dtype != dtype:
                raise ValueError(
                    f"batch['{k}'] is {got_dtype}{list(got_shape)}, but the "
                    f"artifact was exported for {dtype}{list(shape)} "
                    f"(fixed-shape serving; re-export for other shapes; "
                    f"canvas-width ladder: {self.canvas_widths}). "
                    f"Full signature: {self._signature_str()}"
                )
            out[k] = v
        return out

    def _signature_str(self) -> str:
        return ", ".join(
            f"{k}: {dtype}{list(shape)}"
            for k, (shape, dtype) in sorted(self.batch_spec.items())
        )

    def fit_batch(self, batch: dict) -> dict:
        """Pad the pixel canvas UP to the nearest width-ladder program.

        For producers whose batch widths don't exactly match the ladder
        (e.g. a bucketed loader that safety-widened a batch to cover a
        corrupt full-canvas image): zero columns beyond the valid patches
        are masked padding, so padding up is lossless."""
        if self.canvas_widths is None or "pixel_values" not in batch:
            return batch
        pv = batch["pixel_values"]
        w = int(np.shape(pv)[WIDTH_AXIS])
        target = pick_from_ladder(self.canvas_widths, w)
        if target == w:
            return batch
        import jax.numpy as jnp

        pad = [(0, 0)] * np.ndim(pv)
        pad[WIDTH_AXIS] = (0, target - w)
        batch = dict(batch)
        batch["pixel_values"] = (
            np.pad(pv, pad) if isinstance(pv, np.ndarray) else jnp.pad(pv, pad)
        )
        return batch

    def warmup(self) -> None:
        """Run one zero batch through EVERY program variant so no request
        (at any load level / canvas width) pays lazy compilation."""
        for bs, w in sorted(self._programs):
            batch = {}
            for k, (shape, dtype) in self.batch_spec.items():
                shp = [bs] + list(shape)[1:]
                if k == "pixel_values" and w is not None:
                    shp[WIDTH_AXIS] = w
                batch[k] = np.zeros(tuple(shp), dtype)
            self(batch)

    def __call__(self, batch: dict):
        batch = self.validate_batch(batch)
        bs = np.shape(next(iter(batch.values())))[0]
        w = (
            np.shape(batch["pixel_values"])[WIDTH_AXIS]
            if "pixel_values" in batch and self.canvas_widths is not None
            else None
        )
        if self._device_params is None:
            import jax.numpy as jnp

            self._device_params = jax.tree_util.tree_map(
                jnp.asarray, self.params
            )
            # drop the host copy (ViLT-base f32 is ~350 MB); the device tree
            # serves any remaining .params reader as array-likes
            self.params = self._device_params
        key = (bs, w)
        if key not in self._jit_calls:  # bs valid, width valid, combo absent
            raise ValueError(
                f"no exported program for (batch={bs}, width={w}); available:"
                f" {sorted(self._programs)}"
            )
        return self._jit_calls[key](self._device_params, batch)


def make_predict_meta(model, args, spec, loss_type: str) -> dict:
    """Collect everything ``predict --from_export`` needs to rebuild the
    input pipeline without the model: canvas/tokenizer config + head spec."""
    cfg = model.cfg
    return {
        "task_key": spec.task_key,
        "loss_type": loss_type,
        "model_type": spec.model_type,
        "num_labels": int(spec.num_labels),
        "num_images": int(spec.num_images),
        "num_choices": int(spec.num_choices or 0),
        "batch_size": int(args.batch_size),
        "hidden_size": int(cfg.hidden_size),
        "max_text_len": int(cfg.max_text_len),
        "image_height": int(cfg.image_height),
        "image_width": int(cfg.image_width),
        "patch_size": int(cfg.patch_size),
        "compute_dtype": str(cfg.compute_dtype),
        "encoder_name": str(getattr(args, "encoder_name", "vilt")),
        "dense_impl": str(getattr(args, "dense_impl", "xla") or "xla"),
        "tokenizer": str(getattr(args, "tokenizer", "bert-base-uncased")),
    }


def predict_shim(meta) -> "object":
    """A model-shaped stand-in for predict's input pipeline when serving
    --from_export: only the fields the batch builders touch (cfg geometry,
    the task head spec, mesh=None)."""
    from types import SimpleNamespace

    from climb_tpu.models.model_config import HeadSpec

    spec = HeadSpec(
        task_key=meta["task_key"],
        model_type=meta["model_type"],
        num_labels=int(meta["num_labels"]),
        num_images=int(meta["num_images"]),
        num_choices=int(meta["num_choices"]) or None,
    )
    cfg = SimpleNamespace(
        hidden_size=int(meta["hidden_size"]),
        max_text_len=int(meta["max_text_len"]),
        image_height=int(meta["image_height"]),
        image_width=int(meta["image_width"]),
        patch_size=int(meta["patch_size"]),
        compute_dtype=meta["compute_dtype"],
    )
    return SimpleNamespace(cfg=cfg, head_specs=(spec,), params=None, mesh=None)
