"""The fused-QKV apply path (one (D,3D) GEMM, cfg.fuse_qkv=True) must be a
pure execution-strategy change: same parameter pytree, same outputs as the
three-GEMM path."""

import jax
import jax.numpy as jnp
import numpy as np

from climb_tpu.models import ViltCore, ViltConfig

BASE = dict(
    vocab_size=120, hidden_size=64, num_layers=2, num_heads=4,
    intermediate_size=128, image_height=64, image_width=96, patch_size=32,
    pretrain_image_size=64,
)


def _batch(rng, b=2, L=40):
    return (
        jnp.asarray(rng.randint(1, 120, (b, L)), jnp.int32),
        jnp.ones((b, L), jnp.float32),
        jnp.asarray(rng.rand(b, 64, 96, 3), jnp.float32),
        jnp.asarray(rng.randint(1, 3, (b, 2)), jnp.int32),
    )


def test_fused_qkv_same_params_same_outputs():
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    cfg0, cfg1 = ViltConfig(**BASE), ViltConfig(**BASE, fuse_qkv=True)

    p0 = ViltCore(cfg0).init(jax.random.PRNGKey(0), *batch)["params"]
    p1 = ViltCore(cfg1).init(jax.random.PRNGKey(0), *batch)["params"]
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)

    seq0, pool0, _ = ViltCore(cfg0).apply({"params": p0}, *batch)
    seq1, pool1, _ = ViltCore(cfg1).apply({"params": p0}, *batch)
    np.testing.assert_allclose(np.asarray(pool0), np.asarray(pool1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(seq0), np.asarray(seq1), atol=1e-5)


def test_fused_qkv_gradients_match():
    rng = np.random.RandomState(1)
    batch = _batch(rng)
    cfg0, cfg1 = ViltConfig(**BASE), ViltConfig(**BASE, fuse_qkv=True)
    params = ViltCore(cfg0).init(jax.random.PRNGKey(0), *batch)["params"]

    def loss(p, cfg):
        _, pooled, _ = ViltCore(cfg).apply({"params": p}, *batch)
        return jnp.sum(pooled**2)

    g0 = jax.grad(loss)(params, cfg0)
    g1 = jax.grad(loss)(params, cfg1)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
