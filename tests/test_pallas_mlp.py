"""Fused Pallas MLP vs the XLA block path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.ops.pallas_mlp import fused_mlp


def test_fused_mlp_matches_reference(rng):
    d, f = 64, 256
    x = jnp.asarray(rng.randn(3, 50, d).astype(np.float32) * 0.3)
    w1 = jnp.asarray(rng.randn(d, f).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.randn(f).astype(np.float32) * 0.05)
    w2 = jnp.asarray(rng.randn(f, d).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.randn(d).astype(np.float32) * 0.05)
    ref = jax.nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2
    out = fused_mlp(x, w1, b1, w2, b2)
    # limited by the in-kernel polynomial erf (|err|<=1.5e-7 per element)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_model_with_pallas_mlp_matches_xla(rng):
    from climb_tpu.models import ViltConfig, ViltCore

    kw = dict(
        vocab_size=100, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, image_height=64, image_width=96, patch_size=32,
        pretrain_image_size=64,
    )
    ids = jnp.asarray(rng.randint(1, 100, (2, 40)), jnp.int32)
    mask = jnp.ones((2, 40))
    pv = jnp.asarray(rng.rand(2, 64, 96, 3).astype(np.float32))
    phw = jnp.array([[2, 3], [1, 2]], jnp.int32)

    core_x = ViltCore(ViltConfig(**kw, mlp_impl="xla"))
    params = core_x.init(jax.random.PRNGKey(0), ids, mask, pv, phw)
    _, pooled_x, _ = core_x.apply(params, ids, mask, pv, phw)
    core_p = ViltCore(ViltConfig(**kw, mlp_impl="pallas"))
    # identical param tree: the fused path reuses the Dense kernel layout
    _, pooled_p, _ = core_p.apply(params, ids, mask, pv, phw)
    np.testing.assert_allclose(
        np.asarray(pooled_p), np.asarray(pooled_x), atol=5e-4, rtol=1e-3
    )


def test_fused_mlp_gradients_match_xla(rng):
    """custom-VJP backward (recompute-style) == autodiff through the XLA MLP."""
    import jax
    import jax.numpy as jnp

    from climb_tpu.ops.pallas_mlp import fused_mlp

    d, f, rows = 32, 64, 48
    x = jnp.asarray(rng.randn(2, rows // 2, d), jnp.float32)
    w1 = jnp.asarray(rng.randn(d, f) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.randn(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.randn(f, d) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.randn(d) * 0.1, jnp.float32)
    dy = jnp.asarray(rng.randn(2, rows // 2, d), jnp.float32)

    def ref(x, w1, b1, w2, b2):
        import flax.linen as nn

        return nn.gelu(x @ w1 + b1, approximate=False) @ w2 + b2

    def loss_p(*a):
        return (fused_mlp(*a) * dy).sum()

    def loss_r(*a):
        return (ref(*a) * dy).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
