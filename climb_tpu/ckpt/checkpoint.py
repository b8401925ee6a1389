"""Task-granular checkpointing (parity: reference torch.save layout).

Reference behavior (train_upstream_continual_learning.py:260-267):
after each task, save the full model state dict to
``checkpoints/task{i}_{key}/model`` and the encoder-only state dict to
``.../encoder``; consumers load either the full model (forgetting eval,
low-shot multimodal) or the encoder only (Phase II drivers). Resume skips a
task when its checkpoint exists (:222-240), with a partial-state-dict
fallback that copies matching keys and reports the rest (:228-236).

Format: flax msgpack serialization of the raw parameter pytree — fast,
dependency-light, and mesh-agnostic (arrays are host numpy on save; callers
re-shard on load).
"""

import logging
import os
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def save_params(tree, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = serialization.msgpack_serialize(_to_host(tree))
    with open(path, "wb") as f:
        f.write(blob)


def load_params(path: str) -> dict:
    """Load a parameter tree. Accepts both our msgpack checkpoints and
    reference (PyTorch CLiMB) ``torch.save`` state dicts — the latter are
    auto-detected and converted (see ``ckpt/torch_import.py``), so users
    migrating from the reference can point checkpoint flags at their
    existing ``model``/``encoder`` files directly."""
    from climb_tpu.ckpt.torch_import import is_torch_checkpoint, load_reference_checkpoint

    if is_torch_checkpoint(path):
        logger.info("Detected reference torch checkpoint at %s; converting", path)
        return load_reference_checkpoint(path)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_train_state(state, meta: dict, path: str):
    """Atomic save of the FULL training state (params + optimizer moments +
    step) plus host metadata — enables mid-task elastic resume, which the
    reference cannot do (SURVEY.md section 5.3: optimizer state lives only in
    RAM there; recovery granularity is a whole task)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "state": serialization.to_state_dict(_to_host(state)),
        "meta": {k: np.asarray(v) for k, v in meta.items()},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    os.replace(tmp, path)


def load_train_state(template_state, path: str):
    """Restore (state, meta) saved by save_train_state; `template_state` is a
    freshly-created TrainState providing the pytree structure."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(template_state, payload["state"])
    return state, payload["meta"]


def task_dir(output_dir: str, task_num: int, task_key: str) -> str:
    return os.path.join(output_dir, "checkpoints", f"task{task_num}_{task_key}")


def task_checkpoint_exists(output_dir: str, task_num: int, task_key: str) -> bool:
    return os.path.isfile(os.path.join(task_dir(output_dir, task_num, task_key), "model"))


def save_task_checkpoint(output_dir: str, task_num: int, task_key: str, params: dict, encoder_key: str = "vilt"):
    """Full model + encoder-only export, reference layout."""
    d = task_dir(output_dir, task_num, task_key)
    os.makedirs(d, exist_ok=True)
    save_params(params, os.path.join(d, "model"))
    save_params(params[encoder_key], os.path.join(d, "encoder"))
    logger.info("Saved checkpoint to %s", d)


def load_task_checkpoint(output_dir: str, task_num: int, task_key: str) -> dict:
    return load_params(os.path.join(task_dir(output_dir, task_num, task_key), "model"))


def partial_load(target: dict, source: dict, path: str = "") -> Tuple[dict, list, list]:
    """Copy matching keys (same path + shape) from source into target.

    Returns (merged, loaded_keys, missing_keys) — the functional analogue of
    the reference's partial-state-dict fallback
    (train_upstream_continual_learning.py:228-236).
    """
    loaded, missing = [], []

    def merge(t, s, prefix):
        if isinstance(t, dict):
            out = {}
            for k, v in t.items():
                sub = s.get(k) if isinstance(s, dict) else None
                out[k] = merge(v, sub, f"{prefix}/{k}")
            return out
        if s is not None and getattr(s, "shape", None) == getattr(t, "shape", None):
            loaded.append(prefix)
            return s
        missing.append(prefix)
        return t

    merged = merge(target, source, path)
    if missing:
        logger.warning("partial_load: %d keys kept from init (e.g. %s)", len(missing), missing[:5])
    return merged, loaded, missing
