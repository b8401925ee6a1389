"""Throughput sweep over (remat, remat_policy, grad_accum, batch) on the
real TPU chip — finds the fastest train-step config for bench.py.

Hypothesis under test: noremat at batch 64 loses to remat-full (516 vs 542
ex/s) because activations spill in HBM; grad accumulation halves the live
activation footprint (microbatch 32) while removing the remat recompute
(~33% extra forward FLOPs), so accum+noremat may beat both.

Usage: python exp_scripts/bench_sweep.py [config_index ...]
Prints one JSON line per config.
"""

import json
import sys
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = [
    # (name, batch, remat, policy, accum[, extra_args])
    ("remat_full_b64", 64, True, "full", 1),          # current bench config
    ("noremat_accum2_b64", 64, False, "full", 2),
    ("noremat_accum4_b64", 64, False, "full", 4),
    ("dots_accum2_b64", 64, True, "dots", 2),
    ("noremat_b32", 32, False, "full", 1),            # pure small batch
    ("noremat_accum2_b128", 128, False, "full", 2),
    ("dots_accum4_b64", 64, True, "dots", 4),        # 6
    ("full_accum2_b64", 64, True, "full", 2),        # 7
    ("dots_accum2_b128", 128, True, "dots", 2),      # 8
    ("selective_accum2_b64", 64, True, "selective", 2),  # 9
    ("dots_b32", 32, True, "dots", 1),               # 10
    ("dots_accum8_b64", 64, True, "dots", 8),        # 11
    ("dots_accum16_b64", 64, True, "dots", 16),      # 12
    ("noremat_accum4_b64", 64, False, "full", 4),    # 13
    ("dots_accum4_b128", 128, True, "dots", 4),      # 14
    ("dots_accum8_b128", 128, True, "dots", 8),      # 15
    ("dots_accum3_b64", 64, True, "dots", 3),        # 16  (microbatch 21-22? no: 64/3 not integer — skip)
    ("selective_accum4_b64", 64, True, "selective", 4),  # 17
    ("selective_accum8_b64", 64, True, "selective", 8),  # 18
    ("noremat_accum8_b64", 64, False, "full", 8),        # 19
    ("selective_accum8_b128", 128, True, "selective", 8),  # 20
    ("best_pallas_mlp", 64, True, "selective", 4, {"mlp_impl": "pallas"}),   # 21
    ("best_pallas_attn", 64, True, "selective", 4, {"attn_impl": "pallas"}), # 22
    ("best_fused_qkv", 64, True, "selective", 4, {"fuse_qkv": True}),        # 23
    ("best_rerun", 64, True, "selective", 4),                                # 24 (control)
    ("best_accum_unroll", 64, True, "selective", 4, {"accum_unroll": 4}),    # 25
    ("best_fused_block", 64, True, "selective", 4, {"attn_impl": "fused_block"}),  # 26
    ("fused_block_noaccum", 64, True, "selective", 1, {"attn_impl": "fused_block"}),  # 27
    ("fused_block_full_remat", 64, True, "full", 4, {"attn_impl": "fused_block"}),  # 28
]


def run(name, batch, remat, policy, accum, extra=None):
    from climb_tpu.configs import task_configs
    from climb_tpu.train import TrainState, create_cl_model, make_train_step
    from climb_tpu.train.optimizer import make_optimizer

    kw = dict(
        batch_size=batch, seed=0,
        ordered_cl_tasks=["vqa", "nlvr2", "snli-ve", "vcr"],
        encoder_name="vilt", pretrained_model_name="scratch",
        tiny=False, synthetic=True, compute_dtype="bfloat16",
        attn_impl="xla", mlp_impl="xla",
        remat=remat, remat_policy=policy, scan_unroll=12,
    )
    extra = dict(extra or {})
    accum_unroll = extra.pop("accum_unroll", 1)
    kw.update(extra)
    args = SimpleNamespace(**kw)
    model = create_cl_model(args, task_configs)
    cfg = model.cfg
    tx = make_optimizer(model.params, lr=5e-5, total_steps=10_000, warmup_ratio=0.1)
    state = TrainState.create(apply_fn=model.module.apply, params=model.params, tx=tx)
    train_step = make_train_step(model.module, "snli-ve", "ce", cfg.compute_dtype,
                                 grad_accum_steps=accum, accum_unroll=accum_unroll)

    rng = np.random.RandomState(0)
    b = batch
    batch_data = {
        "input_ids": jnp.asarray(rng.randint(1, cfg.vocab_size, (b, cfg.max_text_len)), jnp.int32),
        "text_mask": jnp.ones((b, cfg.max_text_len), jnp.float32),
        "pixel_values": jnp.asarray(
            rng.randint(0, 255, (b, cfg.image_height, cfg.image_width, 3)), jnp.uint8),
        "patch_hw": jnp.broadcast_to(jnp.array([cfg.grid_h, cfg.grid_w], jnp.int32), (b, 2)),
        "labels": jnp.asarray(rng.randint(0, 3, (b,)), jnp.int32),
    }

    key = jax.random.PRNGKey(0)
    try:
        for _ in range(3):
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch_data, sub)
        float(metrics["loss"])
    except Exception as e:  # OOM etc.
        print(json.dumps({"config": name, "error": str(e)[:200]}), flush=True)
        return

    steps = max(1, 640 // b)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch_data, sub)
        float(metrics["loss"])
        best = min(best, time.perf_counter() - t0)
    exps = b * steps / best
    print(json.dumps({"config": name, "examples_per_sec": round(exps, 1)}), flush=True)


if __name__ == "__main__":
    picks = [int(a) for a in sys.argv[1:]] or range(len(CONFIGS))
    for i in picks:
        run(*CONFIGS[i])
