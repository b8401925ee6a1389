"""Portable grad-accum auto-tuning: a one-time on-device micro-sweep.

``--grad_accum_steps auto`` picks the microbatch count from a token-budget
heuristic whose constant (train_step.AUTO_ACCUM_TOKEN_BUDGET ~ 8k encoder
tokens per microbatch) was measured on TPU v5e (exp_scripts/
bench_accum_width.py). On other chip generations that constant may be wrong.
Two escape hatches keep 'auto' honest off-v5e:

- ``--auto_accum_token_budget N`` overrides the constant directly (re-measure
  once with exp_scripts/bench_accum_width.py on the new chip — recipe in
  docs/PERF.md).
- ``--grad_accum_steps sweep`` measures instead of predicting: the first time
  a batch SHAPE is seen, every power-of-2 accum candidate is timed on-device
  (on throwaway copies of the train state — the real optimizer trajectory is
  untouched) and the fastest is cached persistently per
  (device_kind, shape signature) in ``~/.cache/climb_tpu_accum.json``.
  Subsequent steps — and subsequent RUNS on the same chip kind — hit the
  cache. Cost: one extra jit compile + a few timed steps per (shape,
  candidate), once per chip generation.

The sweep always includes accum=1, so by construction its pick is never
slower than no-accumulation on the measuring device.
"""

import json
import logging
import os
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

DEFAULT_CACHE_PATH = os.path.expanduser("~/.cache/climb_tpu_accum.json")


def shape_key(batch: dict, patch_size: int, config_sig: str = "",
              n_devices: int = 1) -> str:
    """Cache key: device kind + topology + the shape facts the optimum
    depends on (per-pass sequence length, batch size, fold multiplicity —
    shared with the 'auto' policy via train_step.batch_shape_signature) + a
    step-config signature (remat/unroll/dtype/... — the optimum is
    config-dependent: CLAUDE.md's sweeps show noremat+accum always loses, so
    a pick cached under one config must never be reused under another).
    ``n_devices`` is the number of devices the step spans: the microbatch
    optimum tracks the PER-DEVICE batch, so a single-chip pick at global
    batch 64 must not be served to an 8-chip mesh run at the same global
    batch (per-device batch 8)."""
    from climb_tpu.train.train_step import batch_shape_signature

    seq_len, n_seqs, bs = batch_shape_signature(batch, patch_size)
    fold = n_seqs // bs
    kind = jax.devices()[0].device_kind.replace(" ", "_")
    key = f"{kind}|n{n_devices}|b{bs}|s{seq_len}|f{fold}"
    return f"{key}|{config_sig}" if config_sig else key


def step_config_signature(cfg) -> str:
    """The ViltConfig facts the accum optimum depends on."""
    return (
        f"{cfg.dtype}|remat={int(cfg.remat)}:{cfg.remat_policy}"
        f"|unroll={cfg.scan_unroll}|attn={cfg.attn_impl}|mlp={cfg.mlp_impl}"
        f"|qkv={int(cfg.fuse_qkv)}|L={cfg.num_layers}|D={cfg.hidden_size}"
    )


def accum_candidates(batch_size: int, max_accum: int = 16) -> List[int]:
    """Power-of-2 divisors of the batch size, smallest first (1 always in)."""
    out, a = [], 1
    while a <= min(batch_size, max_accum) and batch_size % a == 0:
        out.append(a)
        a *= 2
    return out


def load_cache(path: str = DEFAULT_CACHE_PATH) -> Dict[str, dict]:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def save_cache(cache: Dict[str, dict], path: str = DEFAULT_CACHE_PATH) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cache, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _time_step(step_fn: Callable, state, batch, rng, *refs,
               warmup: int = 1, iters: int = 2) -> float:
    """Median-free best-of-iters wall time of one train step, on throwaway
    state copies (the step donates its state argument, so each call gets a
    fresh copy; the caller's state is never touched). ``*refs`` (ewc_ref /
    fd_ref) are forwarded so the timed computation — and the jitted arg
    treedef the winner is cached under — is exactly the production step.
    float(loss) forces a device sync — block_until_ready alone is not a hard
    sync through the remote-TPU tunnel (CLAUDE.md)."""

    def run_once():
        scratch = jax.tree_util.tree_map(jnp.copy, state)
        t0 = time.perf_counter()
        _, metrics = step_fn(scratch, batch, rng, *refs)
        float(metrics["loss"])
        return time.perf_counter() - t0

    for _ in range(warmup):
        run_once()
    return min(run_once() for _ in range(iters))


def sweep_accum(
    make_step: Callable[[int], Callable],
    state,
    batch,
    rng,
    *refs,
    candidates: Optional[List[int]] = None,
    timer: Callable = _time_step,
) -> dict:
    """Time every candidate accum value on-device; return
    ``{"accum": best, "times_s": {str(a): t}}``. ``make_step(a)`` must build
    the jitted train step for accum ``a`` (trainer's own factory); ``*refs``
    are extra step arguments (ewc_ref / fd_ref) the production step runs
    with."""
    if candidates is None:
        bs = jax.tree_util.tree_leaves(batch)[0].shape[0]
        candidates = accum_candidates(bs)
    assert 1 in candidates, "accum=1 must be a candidate (the no-regression floor)"
    times = {}
    for a in candidates:
        times[str(a)] = timer(make_step(a), state, batch, rng, *refs)
        logger.info("accum sweep: accum=%d -> %.4fs/step", a, times[str(a)])
    best = int(min(times, key=times.get))
    return {"accum": best, "times_s": times}


class AccumTuner:
    """Per-(shape, step-config) sweep results, backed by the persistent
    cache file."""

    def __init__(self, patch_size: int, cache_path: str = DEFAULT_CACHE_PATH,
                 config_sig: str = "", n_devices: int = 1):
        self.patch_size = patch_size
        self.cache_path = cache_path
        self.config_sig = config_sig
        self.n_devices = n_devices
        self.cache = load_cache(cache_path)

    def _key(self, batch, refs=()) -> str:
        key = shape_key(batch, self.patch_size, self.config_sig,
                        self.n_devices)
        # active EWC/distill refs add real compute to the step (fused
        # penalty / teacher forward), shifting the optimum — key on presence
        tag = "".join("1" if r is not None else "0" for r in refs)
        return f"{key}|r{tag}" if tag.strip("0") else key

    def get(self, batch, *refs) -> Optional[int]:
        rec = self.cache.get(self._key(batch, refs))
        return int(rec["accum"]) if rec else None

    def tune(self, make_step, state, batch, rng, *refs) -> int:
        key = self._key(batch, refs)
        rec = self.cache.get(key)
        if rec is None:
            logger.info("accum sweep for shape %s (one-time, cached)", key)
            rec = sweep_accum(make_step, state, batch, rng, *refs)
            self.cache[key] = rec
            try:
                save_cache(self.cache, self.cache_path)
            except OSError as e:  # read-only home: still usable this run
                logger.warning("accum cache not persisted: %s", e)
        return int(rec["accum"])
