"""Per-task train-step throughput at the headline config — validates that
the batch-folded NLVR2 (2 images) and VCR (4 choices) forwards keep full MXU
efficiency: their ex/s should be ~1/2 and ~1/4 of SNLI-VE's (same sequences
per second), and VQA within a few % of SNLI-VE (bigger head + soft-target
BCE).

Usage: PYTHONPATH=. python exp_scripts/bench_tasks.py [task ...]
"""

import json
import sys
import time
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

TASKS = ["snli-ve", "vqa", "nlvr2", "vcr"]


def batch_for(task, cfg, bs, rng):
    base = {
        "text_mask": np.ones((bs, cfg.max_text_len), np.float32),
        "patch_hw": np.tile([[cfg.grid_h, cfg.grid_w]], (bs, 1)).astype(np.int32),
    }
    ids = lambda *s: rng.randint(1, cfg.vocab_size, s).astype(np.int32)
    img = lambda *s: rng.randint(0, 255, s).astype(np.uint8)
    H, W = cfg.image_height, cfg.image_width
    if task == "snli-ve":
        base.update(input_ids=ids(bs, cfg.max_text_len),
                    pixel_values=img(bs, H, W, 3),
                    labels=rng.randint(0, 3, (bs,)).astype(np.int32))
    elif task == "vqa":
        base.update(input_ids=ids(bs, cfg.max_text_len),
                    pixel_values=img(bs, H, W, 3),
                    target_scores=rng.rand(bs, 3129).astype(np.float32))
    elif task == "nlvr2":
        base.update(input_ids=ids(bs, cfg.max_text_len),
                    pixel_values=img(bs, 2, H, W, 3),
                    patch_hw=np.tile([[cfg.grid_h, cfg.grid_w]], (bs, 2, 1)).astype(np.int32),
                    labels=rng.randint(0, 2, (bs,)).astype(np.int32))
    elif task == "vcr":
        base.update(input_ids=ids(bs, 4, cfg.max_text_len),
                    text_mask=np.ones((bs, 4, cfg.max_text_len), np.float32),
                    pixel_values=img(bs, H, W, 3),
                    labels=rng.randint(0, 4, (bs,)).astype(np.int32))
    return {k: jnp.asarray(v) for k, v in base.items()}


def main(picks):
    from climb_tpu.configs import task_configs
    from climb_tpu.train import LOSS_TYPES, TrainState, create_cl_model, make_train_step
    from climb_tpu.train.optimizer import make_optimizer

    args = SimpleNamespace(
        batch_size=64, seed=0, ordered_cl_tasks=TASKS, encoder_name="vilt",
        pretrained_model_name="scratch", tiny=False, synthetic=True,
        compute_dtype="bfloat16", attn_impl="xla", mlp_impl="xla",
        remat=True, remat_policy="selective", scan_unroll=12,
    )
    model = create_cl_model(args, task_configs)
    cfg = model.cfg
    rng = np.random.RandomState(0)
    host_params = jax.device_get(model.params)  # train_step donates its state

    for task in picks:
        # reference batch divisors: /2 nlvr2, /4 vcr (same sequences/step)
        bs = {"nlvr2": 32, "vcr": 16}.get(task, 64)
        accum = 4
        params = jax.tree_util.tree_map(jnp.asarray, host_params)
        tx = make_optimizer(params, lr=5e-5, total_steps=10_000)
        state = TrainState.create(apply_fn=model.module.apply, params=params, tx=tx)
        step = make_train_step(model.module, task, LOSS_TYPES[task],
                               cfg.compute_dtype, grad_accum_steps=accum)
        batch = batch_for(task, cfg, bs, rng)
        key = jax.random.PRNGKey(0)
        try:
            for _ in range(3):
                key, sub = jax.random.split(key)
                state, m = step(state, batch, sub)
            float(m["loss"])
        except Exception as e:
            print(json.dumps({"task": task, "error": str(e)[:200]}), flush=True)
            continue
        steps = max(1, 640 // bs)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(steps):
                key, sub = jax.random.split(key)
                state, m = step(state, batch, sub)
            float(m["loss"])
            best = min(best, time.perf_counter() - t0)
        seqs = {"nlvr2": 2, "vcr": 4}.get(task, 1)
        ex_s = bs * steps / best
        print(json.dumps({
            "task": task, "batch": bs, "examples_per_sec": round(ex_s, 1),
            "encoder_seqs_per_sec": round(ex_s * seqs, 1),
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:] or TASKS)
