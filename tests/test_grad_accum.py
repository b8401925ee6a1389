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
