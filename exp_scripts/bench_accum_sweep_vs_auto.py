"""Measured accum sweep vs the 'auto' token-budget pick, per bucket shape.

Round-3 verdict item 4: ``--grad_accum_steps auto`` predicts the fastest
microbatch count from one v5e-calibrated constant (~8k encoder tokens per
microbatch, train_step.AUTO_ACCUM_TOKEN_BUDGET); ``--grad_accum_steps sweep``
measures it on-device instead (accum_tune.py). This script runs the REAL
sweep machinery (AccumTuner.tune, persistent per-device-kind cache) on the
real chip at every production bucket shape (bench.py's BUCKET_MIX) and
records, per shape: each candidate's measured s/step, the swept winner, the
'auto' pick, and the winner-vs-auto throughput ratio. De-risks the one
calibrated constant in the perf story: if 'sweep' ever finds a materially
faster pick than 'auto' on some chip, 'auto''s constant needs re-measuring
there (recipe in docs/PERF.md).

Run on the real TPU (chip otherwise idle — timings are contention-sensitive):
  python exp_scripts/bench_accum_sweep_vs_auto.py [--out ACCUM_SWEEP_r05.json]
"""

import argparse
import json
import os
import sys
import tempfile
from types import SimpleNamespace

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import BATCH, BUCKET_MIX, build_state_and_step, static_batch  # noqa: E402
from climb_tpu.train.accum_tune import (  # noqa: E402
    AccumTuner,
    step_config_signature,
)
from climb_tpu.train.train_step import (  # noqa: E402
    auto_grad_accum_for_batch,
    make_train_step,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "ACCUM_SWEEP_r05.json"))
    ap.add_argument("--iters", type=int, default=3,
                    help="timed iterations per candidate (best-of)")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU rehearsal: tiny model + tiny bucket shapes "
                         "(plumbing check; not a performance measurement)")
    flags = ap.parse_args()

    args = SimpleNamespace(
        batch_size=BATCH, seed=0,
        ordered_cl_tasks=["vqa", "nlvr2", "snli-ve", "vcr"],
        encoder_name="vilt", pretrained_model_name="scratch",
        tiny=flags.tiny, synthetic=True, compute_dtype="bfloat16",
        attn_impl="xla", remat=True, remat_policy="selective",
        scan_unroll=12, grad_accum_steps=1,
    )
    model, cfg, state, _ = build_state_and_step(args)
    make = lambda a: make_train_step(  # noqa: E731
        model.module, "snli-ve", "ce", cfg.compute_dtype, grad_accum_steps=a)
    steps = {}

    def make_cached(a):
        if a not in steps:
            steps[a] = make(a)
        return steps[a]

    # fresh cache file: this run must MEASURE (the production cache would
    # short-circuit tune()); the artifact itself is the record
    cache_path = os.path.join(tempfile.mkdtemp(prefix="accum_sweep_"),
                              "cache.json")
    tuner = AccumTuner(cfg.patch_size, cache_path=cache_path,
                       config_sig=step_config_signature(cfg))

    rng = np.random.RandomState(0)
    key = jax.random.PRNGKey(0)
    shapes = []
    mix = (((96, 16, 1), (64, 24, 1)) if flags.tiny else BUCKET_MIX)
    for width, text_len, _ in mix:
        batch = static_batch(cfg, rng, width=width, text_len=text_len)
        swept = tuner.tune(make_cached, state, batch, key)
        rec = tuner.cache[tuner._key(batch)]
        times = {int(a): t for a, t in rec["times_s"].items()}
        auto = auto_grad_accum_for_batch(batch, cfg.patch_size)
        # the sweep timed every candidate including 'auto''s pick, so the
        # comparison needs no extra measurement
        shapes.append({
            "width": width, "text_len": text_len,
            "candidates_s_per_step": {str(a): round(t, 4)
                                      for a, t in sorted(times.items())},
            "sweep_pick": swept,
            "sweep_ex_per_s": round(BATCH / times[swept], 1),
            "auto_pick": auto,
            "auto_ex_per_s": round(BATCH / times[auto], 1),
            "sweep_vs_auto": round(times[auto] / times[swept], 3),
        })
        print(json.dumps(shapes[-1]), flush=True)

    worst = min(s["sweep_vs_auto"] for s in shapes)
    result = {
        "what": "on-device grad-accum sweep (accum_tune.AccumTuner) vs the "
                "'auto' token-budget pick at every production bucket shape "
                "(bench.py BUCKET_MIX) — round-3 verdict item 4",
        "device_kind": jax.devices()[0].device_kind,
        "step": "bf16, selective remat, scan_unroll 12, batch 64, snli-ve",
        "token_budget_constant": "AUTO_ACCUM_TOKEN_BUDGET=8000 (v5e-measured)",
        "shapes": shapes,
        # >= 1.0 means the measured sweep never loses to 'auto' (it times
        # auto's candidate too); ~1.0 everywhere means 'auto''s constant is
        # correctly calibrated for this device kind
        "min_sweep_vs_auto": worst,
        "auto_matches_sweep_everywhere": all(
            s["sweep_pick"] == s["auto_pick"] or s["sweep_vs_auto"] < 1.03
            for s in shapes),
    }
    with open(flags.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {flags.out}")


if __name__ == "__main__":
    main()
