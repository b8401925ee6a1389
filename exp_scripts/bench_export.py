"""Measure AOT-artifact serving on the real chip: live jitted eval step vs
the jax.export-deserialized artifact (same program via StableHLO round-trip),
in bf16 and int8_static. Expectation: the artifact matches the live step
(same executable after compile) — this pins the 'no serving tax' claim in
docs/SERVING.md with a number.

Run: python exp_scripts/bench_export.py   (real TPU; ~5 min of compiles)
"""

import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

BATCH = 64
STEPS = 20


def timeit(fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # sync incl. compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = fn(*args)
        float(out[1])  # hard sync through the remote backend
        best = min(best, time.perf_counter() - t0)
    return BATCH * STEPS / best


def main():
    from climb_tpu.configs import task_configs
    from climb_tpu.serve import ExportedModel, export_eval_step
    from climb_tpu.train import LOSS_TYPES, create_cl_model
    from climb_tpu.train.train_step import calibrate_quant_scales, make_eval_step

    args = SimpleNamespace(
        batch_size=BATCH, seed=0, ordered_cl_tasks=["snli-ve"],
        encoder_name="vilt", pretrained_model_name="scratch",
        tiny=False, synthetic=True, compute_dtype="bfloat16",
    )
    model = create_cl_model(args, task_configs)
    cfg = model.cfg
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, cfg.vocab_size, (BATCH, cfg.max_text_len)), jnp.int32),
        "text_mask": jnp.ones((BATCH, cfg.max_text_len), jnp.float32),
        "pixel_values": jnp.asarray(rng.randint(0, 255, (BATCH, cfg.image_height, cfg.image_width, 3)), jnp.uint8),
        "patch_hw": jnp.broadcast_to(jnp.array([cfg.grid_h, cfg.grid_w], jnp.int32), (BATCH, 2)),
        "labels": jnp.asarray(rng.randint(0, 3, (BATCH,)), jnp.int32),
    }

    results = {}
    step_bf = make_eval_step(model.module, "snli-ve", LOSS_TYPES["snli-ve"], cfg.compute_dtype)
    results["live_bf16"] = timeit(lambda b: step_bf(model.params, b), batch)
    print(f"live_bf16: {results['live_bf16']:.1f} ex/s", flush=True)

    export_eval_step(step_bf, model.params, batch, "/tmp/bench_bf16.climbx",
                     {"task_key": "snli-ve"})
    art = ExportedModel("/tmp/bench_bf16.climbx")
    results["artifact_bf16"] = timeit(art, batch)
    print(f"artifact_bf16: {results['artifact_bf16']:.1f} ex/s", flush=True)
    print(f"artifact/live bf16: {results['artifact_bf16']/results['live_bf16']:.3f}",
          flush=True)

    if "--int8" in sys.argv:  # slow: several extra full-size tunnel compiles
        cfg_q = cfg.replace(dense_impl="int8_static")
        module_q = type(model.module)(cfg_q, model.head_specs)
        qcol = calibrate_quant_scales(module_q, "snli-ve", model.params, [batch],
                                      cfg.compute_dtype)
        step_q = make_eval_step(module_q, "snli-ve", LOSS_TYPES["snli-ve"],
                                cfg.compute_dtype, extra_vars={"quant": qcol})
        results["live_int8_static"] = timeit(lambda b: step_q(model.params, b), batch)
        print(f"live_int8_static: {results['live_int8_static']:.1f} ex/s", flush=True)

        export_eval_step(step_q, model.params, batch, "/tmp/bench_int8.climbx",
                         {"task_key": "snli-ve"})
        art_q = ExportedModel("/tmp/bench_int8.climbx")
        results["artifact_int8_static"] = timeit(art_q, batch)
        print(f"artifact_int8_static: {results['artifact_int8_static']:.1f} ex/s",
              flush=True)
        print(f"int8/bf16 (artifact): "
              f"{results['artifact_int8_static']/results['artifact_bf16']:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
