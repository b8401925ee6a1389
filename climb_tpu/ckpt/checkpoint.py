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
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def _write_atomic(blob: bytes, path: str):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


class AsyncCheckpointWriter:
    """Overlap checkpoint serialization + disk I/O with training.

    The device->host fetch stays synchronous in the caller (it must: the
    train step donates its input state, so device buffers are invalid one
    step later); serialization and the file write — the expensive part on a
    real host — run on a single background thread. At most one write per
    target path is in flight: a new submit for the same path first joins the
    previous one, which bounds host memory at ~2 snapshots and keeps file
    ordering. All writes are tmp+rename atomic, so a crash mid-write never
    corrupts the previous checkpoint. Call ``flush()`` before reading the
    files back, removing them, or exiting — it re-raises any writer error.
    """

    def __init__(self):
        self._executor = ThreadPoolExecutor(1, thread_name_prefix="ckpt-writer")
        self._pending = {}
        self._lock = threading.Lock()

    def submit(self, host_tree_or_payload, path: str):
        with self._lock:
            prev = self._pending.get(path)
        if prev is not None:
            prev.result()  # keep per-path ordering; re-raise earlier failures

        def job():
            _write_atomic(
                serialization.msgpack_serialize(host_tree_or_payload), path
            )

        fut = self._executor.submit(job)
        with self._lock:
            self._pending[path] = fut
        return fut

    def flush(self):
        with self._lock:
            pending = list(self._pending.values())
            self._pending.clear()
        for f in pending:
            f.result()

    def close(self):
        self.flush()
        self._executor.shutdown(wait=True)


def save_params(tree, path: str, async_writer: Optional[AsyncCheckpointWriter] = None):
    host = _to_host(tree)
    if async_writer is not None:
        async_writer.submit(host, path)
        return
    _write_atomic(serialization.msgpack_serialize(host), path)


def load_params(path: str) -> dict:
    """Load a parameter tree. Accepts both our msgpack checkpoints and
    reference (PyTorch CLiMB) ``torch.save`` state dicts — the latter are
    auto-detected and converted (see ``ckpt/torch_import.py``), so users
    migrating from the reference can point checkpoint flags at their
    existing ``model``/``encoder`` files directly."""
    from climb_tpu.ckpt.torch_import import is_torch_checkpoint, load_reference_checkpoint

    if os.path.isdir(path):
        from climb_tpu.ckpt.sharded import is_sharded_checkpoint, load_sharded

        if is_sharded_checkpoint(path):
            tree, _ = load_sharded(path)
            return tree
        raise FileNotFoundError(f"{path} is a directory without a sharded-checkpoint manifest")
    if is_torch_checkpoint(path):
        logger.info("Detected reference torch checkpoint at %s; converting", path)
        return load_reference_checkpoint(path)
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def save_train_state(state, meta: dict, path: str,
                     async_writer: Optional[AsyncCheckpointWriter] = None,
                     sharded: bool = False):
    """Atomic save of the FULL training state (params + optimizer moments +
    step) plus host metadata — enables mid-task elastic resume, which the
    reference cannot do (SURVEY.md section 5.3: optimizer state lives only in
    RAM there; recovery granularity is a whole task). With ``async_writer``
    the serialization + disk write overlap the next training steps (the
    host snapshot is taken synchronously — the donated device buffers are
    gone one step later).

    ``sharded=True`` writes a sharded-checkpoint DIRECTORY at ``path``
    instead (see ``ckpt/sharded.py``): exactly what FSDP runs need, since
    params AND AdamW moments are the sharded tensors. The device->host
    shard fetch is synchronous either way, so ``async_writer`` is ignored
    for sharded saves (each process's write is already 1/nth the bytes)."""
    if sharded:
        from climb_tpu.ckpt.sharded import save_sharded

        save_sharded(
            {
                "state": serialization.to_state_dict(state),
                "meta": {k: np.asarray(v) for k, v in meta.items()},
            },
            path,
        )
        return
    payload = {
        "state": serialization.to_state_dict(_to_host(state)),
        "meta": {k: np.asarray(v) for k, v in meta.items()},
    }
    if async_writer is not None:
        async_writer.submit(payload, path)
        return
    _write_atomic(serialization.msgpack_serialize(payload), path)


def load_train_state(template_state, path: str):
    """Restore (state, meta) saved by save_train_state; `template_state` is a
    freshly-created TrainState providing the pytree structure. Sharded
    directories (``sharded=True`` saves) are auto-detected; leaves land on
    host and re-shard on first use like the msgpack path."""
    if os.path.isdir(path):
        from climb_tpu.ckpt.sharded import load_sharded

        tree, _ = load_sharded(path)
        state = serialization.from_state_dict(template_state, tree["state"])
        return state, tree["meta"]
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(template_state, payload["state"])
    return state, payload["meta"]


def task_dir(output_dir: str, task_num: int, task_key: str) -> str:
    return os.path.join(output_dir, "checkpoints", f"task{task_num}_{task_key}")


def task_checkpoint_exists(output_dir: str, task_num: int, task_key: str) -> bool:
    path = os.path.join(task_dir(output_dir, task_num, task_key), "model")
    if os.path.isfile(path):
        return True
    from climb_tpu.ckpt.sharded import is_sharded_checkpoint

    return is_sharded_checkpoint(path)


def save_task_checkpoint(output_dir: str, task_num: int, task_key: str, params: dict,
                         encoder_key: str = "vilt", sharded: bool = False):
    """Full model + encoder-only export, reference layout.

    ``sharded=True`` writes each as a sharded-checkpoint DIRECTORY instead of
    a host-gathered msgpack file: every process stores only its addressable
    unique shards (the FSDP/multi-host-native path, see ``ckpt/sharded.py``);
    all readers (``load_params`` / Phase II drivers / resume) auto-detect it.
    """
    d = task_dir(output_dir, task_num, task_key)
    os.makedirs(d, exist_ok=True)
    if sharded:
        from climb_tpu.ckpt.sharded import save_sharded

        save_sharded(params, os.path.join(d, "model"))
        save_sharded(params[encoder_key], os.path.join(d, "encoder"))
    else:
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
