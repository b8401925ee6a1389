"""Eval/serving forward throughput: bf16 XLA vs the int8 MXU dense path.

v5e peak is 394 int8 TOPS vs 197 bf16 TFLOPS; the serving forward
(`--dense_impl int8`, ops/quant.py) quantizes every encoder GEMM
(per-channel weight + dynamic per-row activation scales, int32 accum).
This measures the real speedup at ViLT-base shapes on the chip, eval
batch 64 (the measured forward-only sweet spot).

Usage: python exp_scripts/bench_int8_eval.py [batch ...]
"""

import json
import sys
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np


def run(batch: int, dense_impl: str):
    from climb_tpu.configs import task_configs
    from climb_tpu.train import create_cl_model
    from climb_tpu.train.train_step import make_eval_step

    args = SimpleNamespace(
        batch_size=batch, seed=0,
        ordered_cl_tasks=["vqa", "nlvr2", "snli-ve", "vcr"],
        encoder_name="vilt", pretrained_model_name="scratch",
        tiny=False, synthetic=True, compute_dtype="bfloat16",
        attn_impl="xla", mlp_impl="xla", dense_impl=dense_impl,
        remat=False, remat_policy="full", scan_unroll=12,
    )
    model = create_cl_model(args, task_configs)
    cfg = model.cfg

    rng = np.random.RandomState(0)
    b = batch
    batch_data = {
        "input_ids": jnp.asarray(
            rng.randint(1, cfg.vocab_size, (b, cfg.max_text_len)), jnp.int32),
        "text_mask": jnp.ones((b, cfg.max_text_len), jnp.float32),
        "pixel_values": jnp.asarray(
            rng.randint(0, 255, (b, cfg.image_height, cfg.image_width, 3)),
            jnp.uint8),
        "patch_hw": jnp.broadcast_to(
            jnp.array([cfg.grid_h, cfg.grid_w], jnp.int32), (b, 2)),
        "labels": jnp.asarray(rng.randint(0, 3, (b,)), jnp.int32),
    }

    extra_vars = None
    if dense_impl == "int8_static":
        from climb_tpu.train.train_step import calibrate_quant_scales

        qcol = calibrate_quant_scales(
            model.module, "snli-ve", model.params, [batch_data, batch_data],
            cfg.compute_dtype,
        )
        extra_vars = {"quant": qcol}
    eval_step = make_eval_step(model.module, "snli-ve", "ce",
                               cfg.compute_dtype, extra_vars=extra_vars)

    out = eval_step(model.params, batch_data)
    float(out[1])  # hard sync
    steps = max(1, 1280 // b)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = eval_step(model.params, batch_data)
        float(out[1])
        best = min(best, time.perf_counter() - t0)
    exps = b * steps / best
    print(json.dumps({
        "config": f"eval_{dense_impl}_b{batch}",
        "examples_per_sec": round(exps, 1),
    }), flush=True)


if __name__ == "__main__":
    # args: [impl ...] and/or [batch ...] in any order, e.g. `int8 64`
    impls = [a for a in sys.argv[1:] if not a.isdigit()] or ["xla", "int8"]
    batches = [int(a) for a in sys.argv[1:] if a.isdigit()] or [64]
    for b in batches:
        for impl in impls:
            run(b, impl)
