"""Long-sequence language driver A/B: XLA vs Pallas flash attention.

The Pallas KV-blocked flash kernels win in the long-sequence regime
(measured 1.45-1.76x XLA at S=1024-4096, docs/PERF.md) but the Phase I
production canvas sits at S~281-337 where XLA wins — so until round 4 the
kernels had no production user. The language driver's
``reallocate_text_image`` path (reference train_language.py:80-84 +
vilt.py:57-81) IS the long-text regime: ``--max_len_override 1040`` tiles the
40-slot text position table 26x and shrinks the image to 128x128, giving
S = 1040 + 1 + 16 = 1057 >= the measured crossover, where ``--attn_impl
auto`` (the CLI default) switches to the Pallas kernels.

This script runs the REAL language driver end-to-end (synthetic SST-2 data;
SyntheticTextDataset is token arrays only, so the 1-core host keeps up and
per-epoch ex/s is device-bound) once per attention impl and records which
wins — the A/B artifact the round-3 verdict asked for (item 5).

Usage (real TPU): python exp_scripts/bench_longseq_language.py
  [--out LONGSEQ_r05.json] [--max-len 1040] [--batch-size 16] [--impls ...]
"""

import argparse
import json
import os
import re
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the downstream trainer's epoch line (climb_tpu/train/downstream.py):
#   epoch 3 dev=55.00 (812.4 ex/s)
RE_EXS = re.compile(r"epoch (\d+) dev=([\d.]+) \(([\d.]+) ex/s\)")


def run_impl(impl: str, flags, out_root: str) -> dict:
    out_dir = os.path.join(out_root, impl)
    os.makedirs(out_dir, exist_ok=True)
    log_path = os.path.join(out_dir, "driver.log")
    argv = [
        sys.executable, "-m", "climb_tpu.cli.train_language",
        "--task_name", "sst2",
        "--encoder_name", "vilt",
        "--checkpoint_name", "none",
        "--pretrained_model_name", "scratch",
        "--num_shot", str(flags.train_size),
        "--subsample_seed", "42",
        "--output_dir", out_dir,
        "--synthetic",
        "--synthetic_train_size", str(flags.train_size),
        "--batch_size", str(flags.batch_size),
        "--seed", "42",
        "--max_len_override", str(flags.max_len),
        "--eval_every_epoch",
        "--compute_dtype", "bfloat16",
        "--remat", "--remat_policy", "selective",
        "--scan_unroll", "12",
        "--attn_impl", impl,
    ]
    if flags.tiny:
        argv += ["--tiny"]
    t0 = time.time()
    with open(log_path, "w") as logf:
        rc = subprocess.run(argv, cwd=REPO, stdout=logf,
                            stderr=subprocess.STDOUT).returncode
    wall = time.time() - t0
    samples = []
    with open(log_path, errors="replace") as f:
        for line in f:
            m = RE_EXS.search(line)
            if m:
                samples.append(float(m.group(3)))
    # epoch 1 pays the tunnel compile; steady state is the rest
    steady = samples[1:] or samples
    return {
        "attn_impl": impl,
        "returncode": rc,
        "wall_clock_s": round(wall, 1),
        "epoch_ex_per_s": samples,
        "steady_ex_per_s": round(statistics.median(steady), 2) if steady else None,
        "log": log_path,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "LONGSEQ_r05.json"))
    ap.add_argument("--max-len", type=int, default=1040, dest="max_len",
                    help="text tokens (26x the 40-slot table; S = max_len+17)")
    ap.add_argument("--batch-size", type=int, default=16, dest="batch_size")
    ap.add_argument("--train-size", type=int, default=256, dest="train_size")
    ap.add_argument("--impls", default="xla,pallas,auto",
                    help="'auto' must match 'pallas' at this S (same HLO -> "
                         "cached compile) — recorded to prove the CLI "
                         "default picks the winner")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU rehearsal: tiny model config (plumbing check; "
                         "not a performance measurement)")
    flags = ap.parse_args()

    out_root = "/tmp/climb_longseq_ab"
    runs = [run_impl(i, flags, out_root) for i in flags.impls.split(",") if i]
    by = {r["attn_impl"]: r.get("steady_ex_per_s") or 0.0 for r in runs}
    result = {
        "what": "language driver end-to-end at the reallocate_text_image "
                "long-text regime (synthetic SST-2), XLA vs Pallas flash "
                "attention A/B — the production user of the long-seq "
                "kernels (round-3 verdict item 5)",
        "config": {
            "task": "sst2", "max_len": flags.max_len,
            "seq_len": flags.max_len + 1 + 16,
            "image": "128x128 (reallocated)",
            "batch_size": flags.batch_size,
            "train_size": flags.train_size,
            "step": "bf16, selective remat, scan_unroll 12",
        },
        "runs": runs,
    }
    if by.get("xla") and by.get("pallas"):
        result["pallas_speedup_vs_xla"] = round(by["pallas"] / by["xla"], 3)
        result["winner"] = max(("xla", "pallas"), key=lambda k: by[k])
    with open(flags.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    if any(r["returncode"] != 0 for r in runs):
        sys.exit(1)


if __name__ == "__main__":
    main()
