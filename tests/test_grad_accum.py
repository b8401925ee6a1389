"""Gradient accumulation: k microbatches inside one step == full-batch grads."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.configs import task_configs
from climb_tpu.train import TrainState, create_cl_model, make_train_step
from climb_tpu.train.optimizer import make_optimizer


def test_grad_accum_matches_full_batch(rng):
    args = SimpleNamespace(
        batch_size=8, seed=0, ordered_cl_tasks=["snli-ve"], encoder_name="vilt",
        pretrained_model_name="scratch", tiny=True, synthetic=True,
        image_height=64, image_width=96,
    )
    model = create_cl_model(args, task_configs)
    cfg = model.cfg
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 100, (8, 40)), jnp.int32),
        "text_mask": jnp.ones((8, 40)),
        "pixel_values": jnp.asarray(rng.randint(0, 255, (8, 64, 96, 3)), jnp.uint8),
        "patch_hw": jnp.ones((8, 2), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 3, (8,)), jnp.int32),
    }

    import optax

    def run(accum):
        params = jax.tree_util.tree_map(jnp.array, model.params)
        # plain SGD: post-step params differ exactly by lr * mean-grad, so the
        # comparison tests the accumulated gradient itself (Adam's
        # normalization would amplify f32 reduction-order noise on
        # near-zero gradient entries into sign flips)
        state = TrainState.create(
            apply_fn=model.module.apply, params=params, tx=optax.sgd(0.1)
        )
        step = make_train_step(model.module, "snli-ve", "ce", grad_accum_steps=accum)
        state, m = step(state, batch, jax.random.PRNGKey(7))
        return jax.device_get(state.params), float(m["loss"]), float(m["metric_sum"])

    p1, loss1, acc1 = run(1)
    p4, loss4, acc4 = run(4)
    np.testing.assert_allclose(loss4, loss1, rtol=1e-5)
    np.testing.assert_allclose(acc4, acc1, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


def test_accum_unroll_is_equivalent(rng):
    """Unrolling the microbatch scan (for collective overlap on meshes) must
    not change anything numerically."""
    args = SimpleNamespace(
        batch_size=8, seed=0, ordered_cl_tasks=["snli-ve"], encoder_name="vilt",
        pretrained_model_name="scratch", tiny=True, synthetic=True,
        image_height=64, image_width=96,
    )
    model = create_cl_model(args, task_configs)
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 100, (8, 40)), jnp.int32),
        "text_mask": jnp.ones((8, 40)),
        "pixel_values": jnp.asarray(rng.randint(0, 255, (8, 64, 96, 3)), jnp.uint8),
        "patch_hw": jnp.ones((8, 2), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 3, (8,)), jnp.int32),
    }
    import optax

    def run(unroll):
        params = jax.tree_util.tree_map(jnp.array, model.params)
        state = TrainState.create(
            apply_fn=model.module.apply, params=params, tx=optax.sgd(0.1)
        )
        step = make_train_step(model.module, "snli-ve", "ce",
                               grad_accum_steps=4, accum_unroll=unroll)
        state, m = step(state, batch, jax.random.PRNGKey(7))
        return jax.device_get(state.params), float(m["loss"])

    p1, l1 = run(1)
    p4, l4 = run(4)
    np.testing.assert_allclose(l4, l1, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6)


def test_grad_accum_exact_with_padded_batch(rng):
    """With a zero-padded final batch, microbatches have unequal valid counts
    (here 2,2,2,0); sum-based accumulation with the global denominator must
    still equal the whole-batch masked step exactly."""
    import optax

    args = SimpleNamespace(
        batch_size=8, seed=0, ordered_cl_tasks=["snli-ve"], encoder_name="vilt",
        pretrained_model_name="scratch", tiny=True, synthetic=True,
        image_height=64, image_width=96,
    )
    model = create_cl_model(args, task_configs)
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 100, (8, 40)), jnp.int32),
        "text_mask": jnp.ones((8, 40)),
        "pixel_values": jnp.asarray(rng.randint(0, 255, (8, 64, 96, 3)), jnp.uint8),
        "patch_hw": jnp.ones((8, 2), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 3, (8,)), jnp.int32),
        "valid": jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0], jnp.float32),
    }

    def run(accum):
        params = jax.tree_util.tree_map(jnp.array, model.params)
        state = TrainState.create(
            apply_fn=model.module.apply, params=params, tx=optax.sgd(0.1)
        )
        step = make_train_step(model.module, "snli-ve", "ce", grad_accum_steps=accum)
        state, m = step(state, batch, jax.random.PRNGKey(7))
        return jax.device_get(state.params), float(m["loss"])

    p1, loss1 = run(1)
    p4, loss4 = run(4)
    np.testing.assert_allclose(loss4, loss1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)


def test_auto_grad_accum_policy_anchors():
    """The 'auto' policy must reproduce the measured v5e optima
    (exp_scripts/bench_accum_width.py): accum4 at the full canvas (S=281),
    accum2 at the 512-wide buckets (S=209/217), whole-batch at 288-wide
    (S=125); and never pick an accum that does not divide the batch."""
    from climb_tpu.train.train_step import (
        auto_grad_accum,
        auto_grad_accum_for_batch,
    )

    assert auto_grad_accum(281, 64) == 4
    assert auto_grad_accum(265, 64) == 4  # 640w/24t: microbatch32 is 8480 tok
    assert auto_grad_accum(217, 64) == 2
    assert auto_grad_accum(209, 64) == 2
    assert auto_grad_accum(233, 64) == 2
    assert auto_grad_accum(125, 64) == 1  # 8000 tok fits the budget exactly

    def batch(bs, text_len, h, w, fold_images=None, fold_choices=None):
        pv_shape = (bs, h, w, 3) if fold_images is None else (bs, fold_images, h, w, 3)
        ids_shape = (bs, text_len) if fold_choices is None else (bs, fold_choices, text_len)
        return {
            "input_ids": np.zeros(ids_shape, np.int32),
            "pixel_values": np.zeros(pv_shape, np.uint8),
        }

    # single image, reference shapes
    assert auto_grad_accum_for_batch(batch(64, 40, 384, 640), 32) == 4
    assert auto_grad_accum_for_batch(batch(64, 16, 384, 512), 32) == 2
    assert auto_grad_accum_for_batch(batch(64, 16, 384, 288), 32) == 1
    # NLVR2 pair fold: 32 examples = 64 encoder sequences at S=281 -> 4
    assert auto_grad_accum_for_batch(batch(32, 40, 384, 640, fold_images=2), 32) == 4
    # VCR choice fold: 16 examples = 64 sequences at S=281 -> 4
    assert auto_grad_accum_for_batch(batch(16, 40, 384, 640, fold_choices=4), 32) == 4
    # accum always divides the batch (bs=24: only 1/2/4/8 divide)
    for bs in (24, 48, 64, 6, 7):
        a = auto_grad_accum_for_batch(batch(bs, 40, 384, 640), 32)
        assert bs % a == 0


def test_auto_dispatcher_matches_fixed_accum(rng, monkeypatch):
    """--grad_accum_steps auto dispatches per batch shape; with the token
    budget patched so the tiny batch resolves to accum=4 (and a second,
    smaller shape to accum=1), the resulting updates must equal the
    fixed-accum steps' and the dispatcher must cache one step per accum."""
    import optax

    from climb_tpu.train import train_step as ts
    from climb_tpu.train.trainers import VLTaskTrainer

    # tiny batch: S = 40 + 1 + 2*3 = 47 tokens/seq, 8 seqs = 376 tokens.
    # Budget 100 -> microbatch 2 seqs (94 tok): accum=4 for the full batch.
    monkeypatch.setattr(ts, "AUTO_ACCUM_TOKEN_BUDGET", 100)

    base = dict(
        batch_size=8, seed=0, ordered_cl_tasks=["snli-ve"], encoder_name="vilt",
        pretrained_model_name="scratch", tiny=True, synthetic=True,
        image_height=64, image_width=96,
    )
    model = create_cl_model(SimpleNamespace(**base), task_configs)
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 100, (8, 40)), jnp.int32),
        "text_mask": jnp.ones((8, 40)),
        "pixel_values": jnp.asarray(rng.randint(0, 255, (8, 64, 96, 3)), jnp.uint8),
        "patch_hw": jnp.ones((8, 2), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 3, (8,)), jnp.int32),
    }
    # a 32-pixel-wide "bucketed" shape: S = 40 + 1 + 2 = 43... keep it under
    # budget per whole batch by shrinking text too: S = 8+1+2 = 11, 8 seqs =
    # 88 tokens <= 100 -> accum=1
    small = {
        "input_ids": batch["input_ids"][:, :8],
        "text_mask": batch["text_mask"][:, :8],
        "pixel_values": batch["pixel_values"][:, :, :32],
        "patch_hw": jnp.ones((8, 2), jnp.int32),
        "labels": batch["labels"],
    }
    assert ts.auto_grad_accum_for_batch(batch, 32) == 4
    assert ts.auto_grad_accum_for_batch(small, 32) == 1

    def run(accum_arg, b):
        trainer = VLTaskTrainer(
            SimpleNamespace(**base, grad_accum_steps=accum_arg),
            task_configs, model_config=None, task_key="snli-ve",
        )
        params = jax.tree_util.tree_map(jnp.array, model.params)
        state = TrainState.create(
            apply_fn=model.module.apply, params=params, tx=optax.sgd(0.1)
        )
        step = trainer._make_train_step_dispatcher(model)
        state, m = step(state, b, jax.random.PRNGKey(7))
        return jax.device_get(state.params), float(m["loss"])

    # full batch: auto resolves to accum=4 and matches the fixed-4 step
    p_auto, loss_auto = run("auto", batch)
    p4, loss4 = run(4, batch)
    np.testing.assert_allclose(loss_auto, loss4, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_auto), jax.tree_util.tree_leaves(p4)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)

    # bucketed shape: auto resolves to accum=1 and matches the fixed-1 step
    p_auto1, loss_auto1 = run("auto", small)
    p1, loss1 = run(1, small)
    np.testing.assert_allclose(loss_auto1, loss1, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_auto1), jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3)
