"""Where does the train step's time go? (real TPU chip)

Times, at the bench config (ViLT-B/32, bf16, batch 64):
  - eval/forward-only step (the serving path)
  - value_and_grad only (no optimizer)
  - full train step (bench config: selective remat + accum4)
and derives achieved TFLOP/s + MFU for each (v5e peak 197 TFLOPs bf16).

Usage: PYTHONPATH=.:$HOME/.axon_site python exp_scripts/step_breakdown.py
"""

import json
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 64
PEAK_TFLOPS = 197.0  # v5e bf16


def model_flops(cfg, batch):
    """Forward FLOPs (matmuls only) for one batch."""
    s = cfg.max_text_len + 1 + cfg.num_patches
    d, f, l = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    per_layer = (
        4 * s * d * d * 2        # qkv + out projections
        + 2 * s * s * d * 2      # qk^T and pv
        + 2 * s * d * f * 2      # fc1 + fc2
    )
    patch = cfg.num_patches * (cfg.patch_size**2 * 3) * d * 2
    return batch * (l * per_layer + patch)


def main():
    from climb_tpu.configs import task_configs
    from climb_tpu.train import TrainState, create_cl_model, make_train_step
    from climb_tpu.train.optimizer import make_optimizer
    from climb_tpu.train.train_step import make_eval_step

    args = SimpleNamespace(
        batch_size=BATCH, seed=0,
        ordered_cl_tasks=["vqa", "nlvr2", "snli-ve", "vcr"],
        encoder_name="vilt", pretrained_model_name="scratch",
        tiny=False, synthetic=True, compute_dtype="bfloat16",
        attn_impl="xla", remat=True, remat_policy="selective", scan_unroll=12,
    )
    model = create_cl_model(args, task_configs)
    cfg = model.cfg
    tx = make_optimizer(model.params, lr=5e-5, total_steps=10_000, warmup_ratio=0.1)
    state = TrainState.create(apply_fn=model.module.apply, params=model.params, tx=tx)

    rng = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, cfg.vocab_size, (BATCH, cfg.max_text_len)), jnp.int32),
        "text_mask": jnp.ones((BATCH, cfg.max_text_len), jnp.float32),
        "pixel_values": jnp.asarray(
            rng.randint(0, 255, (BATCH, cfg.image_height, cfg.image_width, 3)), jnp.uint8),
        "patch_hw": jnp.broadcast_to(jnp.array([cfg.grid_h, cfg.grid_w], jnp.int32), (BATCH, 2)),
        "labels": jnp.asarray(rng.randint(0, 3, (BATCH,)), jnp.int32),
    }
    fwd_flops = model_flops(cfg, BATCH)

    def timeit(fn, sync, n=20):
        for _ in range(3):
            out = fn()
        sync(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            sync(out)
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    results = {}

    eval_step = make_eval_step(model.module, "snli-ve", "ce", cfg.compute_dtype)
    t = timeit(lambda: eval_step(state.params, batch),
               lambda o: float(o[1]))
    results["eval_fwd"] = {
        "ms": round(t * 1e3, 2),
        "ex_per_s": round(BATCH / t, 1),
        "mfu": round(fwd_flops / t / 1e12 / PEAK_TFLOPS, 3),
    }

    from climb_tpu.train.train_step import make_grad_fn

    grad_fn = make_grad_fn(model.module, "snli-ve", "ce", cfg.compute_dtype)
    key = jax.random.PRNGKey(0)
    t = timeit(lambda: grad_fn(state.params, batch, key),
               lambda o: float(o[0]))
    # selective remat => bwd recomputes ~attention-prob flops only; count 3x
    results["value_and_grad"] = {
        "ms": round(t * 1e3, 2),
        "ex_per_s": round(BATCH / t, 1),
        "mfu_3x": round(3 * fwd_flops / t / 1e12 / PEAK_TFLOPS, 3),
    }

    train_step = make_train_step(model.module, "snli-ve", "ce", cfg.compute_dtype,
                                 grad_accum_steps=4)
    st = state

    def run_train():
        nonlocal st
        st, m = train_step(st, batch, key)
        return m

    t = timeit(run_train, lambda m: float(m["loss"]))
    results["train_step_accum4"] = {
        "ms": round(t * 1e3, 2),
        "ex_per_s": round(BATCH / t, 1),
        "mfu_3x": round(3 * fwd_flops / t / 1e12 / PEAK_TFLOPS, 3),
    }

    results["fwd_gflops_per_batch"] = round(fwd_flops / 1e9, 1)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
