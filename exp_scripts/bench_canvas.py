"""Measure train-step throughput vs canvas width (aspect-bucketing headroom).

The fixed (384, 640) canvas spends MXU FLOPs on padding patches whenever the
batch's images are narrower. Most COCO/Flickr photos are 4:3 landscape ->
384x512 after the ViLT resize (S = 40 + 1 + 12*16 = 233 tokens vs 281), and
portrait images fit 384x288 (S = 149). This sweep quantifies the per-bucket
step-time win that loader-side aspect bucketing can harvest.

Run on the real chip: python exp_scripts/bench_canvas.py
"""

import json
import sys
import time
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, ".")
from bench import BATCH, build_state_and_step, static_batch, bench_static, train_gflops_per_example  # noqa: E402


def run(width: int):
    args = SimpleNamespace(
        batch_size=BATCH, seed=0,
        ordered_cl_tasks=["vqa", "nlvr2", "snli-ve", "vcr"],
        encoder_name="vilt", pretrained_model_name="scratch",
        tiny=False, synthetic=True, compute_dtype="bfloat16",
        attn_impl="xla", remat=True, remat_policy="selective",
        scan_unroll=12, image_height=384, image_width=width,
    )
    model, cfg, state, train_step = build_state_and_step(args)
    batch = static_batch(cfg, np.random.RandomState(0))
    ex_s, _ = bench_static(state, train_step, batch)
    print(json.dumps({
        "canvas": [384, width],
        "seq_len": cfg.seq_len,
        "examples_per_sec": round(ex_s, 2),
        "train_gflops_per_example": round(train_gflops_per_example(cfg), 1),
    }), flush=True)
    return ex_s


if __name__ == "__main__":
    widths = [int(w) for w in (sys.argv[1:] or ["640", "512", "288"])]
    base = None
    for w in widths:
        t0 = time.time()
        ex = run(w)
        if base is None:
            base = ex
        else:
            print(json.dumps({"canvas_width": w, "speedup_vs_640": round(ex / base, 3)}), flush=True)
