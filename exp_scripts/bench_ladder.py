"""Measure the serving program ladders on the real chip: per-program
latency of one exported artifact across (batch size x canvas width)
variants (full-size ViLT-B/32, bf16). The ladders' point: an idle HTTP
server answering a single request pays the bs=1 program's latency instead
of padding to the full batch, and a 4:3 photo runs on the 512-wide program
instead of paying 640-canvas padding FLOPs.

Run: python exp_scripts/bench_ladder.py   (real TPU; a few min of compiles)
Prints one JSON line per (batch size, width).
"""

import itertools
import json
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SIZES = (1, 8, 64)
WIDTHS = (512, 640)
REPS = 20


def main():
    from climb_tpu.cli.common import enable_compilation_cache
    from climb_tpu.configs import task_configs
    from climb_tpu.serve import ExportedModel, export_eval_step
    from climb_tpu.train import LOSS_TYPES, create_cl_model
    from climb_tpu.train.train_step import make_eval_step

    enable_compilation_cache()
    args = SimpleNamespace(
        batch_size=max(SIZES), seed=0, ordered_cl_tasks=["snli-ve"],
        encoder_name="vilt", pretrained_model_name="scratch",
        tiny=False, synthetic=True, compute_dtype="bfloat16",
    )
    model = create_cl_model(args, task_configs)
    cfg = model.cfg
    rng = np.random.RandomState(0)
    b = max(SIZES)
    batch = {
        "input_ids": rng.randint(1, cfg.vocab_size, (b, cfg.max_text_len)).astype(np.int32),
        "text_mask": np.ones((b, cfg.max_text_len), np.float32),
        "pixel_values": rng.randint(0, 255, (b, cfg.image_height, cfg.image_width, 3)).astype(np.uint8),
        "patch_hw": np.tile([[cfg.grid_h, cfg.grid_w]], (b, 1)).astype(np.int32),
        "labels": rng.randint(0, 3, (b,)).astype(np.int32),
    }
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], cfg.compute_dtype
    )
    path = "/tmp/ladder_bench.climbx"
    export_eval_step(eval_step, model.params, batch, path,
                     {"task_key": "snli-ve",
                      "patch_size": int(cfg.patch_size)},
                     platforms=("tpu",),
                     batch_sizes=SIZES, canvas_widths=WIDTHS)
    served = ExportedModel(path)

    for bs, w in itertools.product(SIZES, WIDTHS):
        sub = {k: (v[:bs, :, :w] if k == "pixel_values" else v[:bs])
               for k, v in batch.items()}
        out = served(sub)
        float(np.asarray(out[1]))  # compile + sync
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(REPS):
                out = served(sub)
            float(np.asarray(out[1]))
            best = min(best, time.perf_counter() - t0)
        ms = best / REPS * 1e3
        print(json.dumps({
            "batch_size": bs,
            "canvas_width": w,
            "latency_ms_per_call": round(ms, 2),
            "examples_per_sec": round(bs * REPS / best, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
