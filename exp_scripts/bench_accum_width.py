"""Sweep grad-accum microbatching per bucketed (canvas width, text len).

The accum4 / microbatch-16 sweet spot (exp_scripts/bench_sweep.py) was found
at the fixed 384x640 canvas (S=281). Aspect/text bucketing shrinks the token
count per example (w512/t16 -> S=209, w288/t16 -> S=125), which shrinks the
live activation set that microbatching was compensating for — the optimum
may shift toward fewer microbatches (less scan/update overhead per step).
Grad accumulation is trajectory-exact at any accum count
(tests/test_grad_accum.py), so a per-bucket accum choice is a free win.

Run on the real chip: python exp_scripts/bench_accum_width.py
Prints one JSON line per (width, text_len, accum) config.
"""

import itertools
import json
import sys
import time
from types import SimpleNamespace

import jax
import numpy as np

sys.path.insert(0, ".")
from bench import BATCH, build_state_and_step, static_batch  # noqa: E402


def run(width: int, text_len: int, accum: int):
    args = SimpleNamespace(
        batch_size=BATCH, seed=0,
        ordered_cl_tasks=["vqa", "nlvr2", "snli-ve", "vcr"],
        encoder_name="vilt", pretrained_model_name="scratch",
        tiny=False, synthetic=True, compute_dtype="bfloat16",
        attn_impl="xla", remat=True, remat_policy="selective",
        scan_unroll=12, grad_accum_steps=accum,
    )
    model, cfg, state, train_step = build_state_and_step(args)
    batch = static_batch(cfg, np.random.RandomState(0), width=width,
                         text_len=text_len)

    key = jax.random.PRNGKey(0)
    try:
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, sub)
        float(metrics["loss"])
    except Exception as e:
        print(json.dumps({"width": width, "text_len": text_len,
                          "accum": accum, "error": str(e)[:200]}), flush=True)
        return

    steps = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, sub)
        float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({
        "width": width, "text_len": text_len, "accum": accum,
        "seq_len": text_len + 1 + (width // cfg.patch_size) * cfg.grid_h,
        "examples_per_sec": round(BATCH * steps / best, 1),
    }), flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1:
        combos = [tuple(int(x) for x in a.split(",")) for a in sys.argv[1:]]
    else:
        combos = list(itertools.product([288, 512], [16], [1, 2, 4])) + [
            (640, 40, 2), (640, 40, 4),  # control: confirm accum4 at base
            (512, 24, 2), (512, 24, 4),
        ]
    for w, t, a in combos:
        run(w, t, a)
