"""Pallas kernels vs XLA reference numerics (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.ops.attention import mask_to_bias, mha_xla
from climb_tpu.ops.pallas_attention import flash_attention


def make_qkv(rng, b=2, s=70, h=4, d=32):
    q = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(b, s, h, d).astype(np.float32) * 0.3)
    mask = np.ones((b, s), np.float32)
    mask[1, s - 11 :] = 0.0
    bias = mask_to_bias(jnp.asarray(mask))
    return q, k, v, bias, mask


def test_forward_matches_xla(rng):
    q, k, v, bias, _ = make_qkv(rng)
    ref = mha_xla(q, k, v, bias)
    out = flash_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_forward_no_bias(rng):
    q, k, v, _, _ = make_qkv(rng, s=64)
    ref = mha_xla(q, k, v, None)
    out = flash_attention(q, k, v, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_backward_matches_xla(rng):
    q, k, v, bias, mask = make_qkv(rng, b=2, s=50, h=2, d=32)

    def loss_pallas(q, k, v):
        # masked mean so padded-key gradients are exercised
        out = flash_attention(q, k, v, bias)
        return (out * jnp.asarray(mask)[:, :, None, None]).sum()

    def loss_xla(q, k, v):
        out = mha_xla(q, k, v, bias)
        return (out * jnp.asarray(mask)[:, :, None, None]).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5, rtol=1e-3)


def test_model_with_pallas_attention_matches_xla(rng):
    """Whole-encoder forward: cfg.attn_impl='pallas' vs 'xla'."""
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

    core_x = ViltCore(ViltConfig(**kw, attn_impl="xla"))
    params = core_x.init(jax.random.PRNGKey(0), ids, mask, pv, phw)
    _, pooled_x, _ = core_x.apply(params, ids, mask, pv, phw)
    core_p = ViltCore(ViltConfig(**kw, attn_impl="pallas"))
    _, pooled_p, _ = core_p.apply(params, ids, mask, pv, phw)
    np.testing.assert_allclose(
        np.asarray(pooled_p), np.asarray(pooled_x), atol=2e-5, rtol=1e-4
    )


def test_blocked_forward_matches_xla(rng, monkeypatch):
    """Force the KV-blocked (long-seq) path at small sizes and compare with
    the XLA reference (multiple q/k blocks, masked tail)."""
    import climb_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(pa, "WHOLE_SEQ_MAX", 128)
    monkeypatch.setattr(pa, "BLOCK_Q", 128)
    monkeypatch.setattr(pa, "BLOCK_K", 128)
    b, s, h, d = 2, 300, 2, 64  # pads to 384 -> 3x3 blocks
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    mask = jnp.asarray((rng.rand(b, s) > 0.2).astype(np.float32))
    bias = mask_to_bias(mask)
    got = pa.flash_attention(q, k, v, bias)
    want = mha_xla(q, k, v, bias)
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(want)[valid], rtol=2e-5, atol=2e-5
    )


def test_blocked_backward_matches_xla(rng, monkeypatch):
    import climb_tpu.ops.pallas_attention as pa

    monkeypatch.setattr(pa, "WHOLE_SEQ_MAX", 128)
    monkeypatch.setattr(pa, "BLOCK_Q", 128)
    monkeypatch.setattr(pa, "BLOCK_K", 128)
    b, s, h, d = 2, 256, 2, 64
    q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
    mask = jnp.asarray((rng.rand(b, s) > 0.2).astype(np.float32))
    bias = mask_to_bias(mask)
    co = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)

    def loss_p(q, k, v):
        return (pa.flash_attention(q, k, v, bias) * co).sum()

    def loss_x(q, k, v):
        return (mha_xla(q, k, v, bias) * co).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=3e-4, atol=3e-4)


def test_attn_impl_auto_matches_xla_short_seq():
    """'auto' must resolve to the XLA path below the S=2048 production
    crossover (and on non-TPU backends), matching it exactly. (r05: the
    end-to-end crossover sits at 2048, not the kernel microbench's 1024 —
    LONGSEQ_r05.json.)"""
    import numpy as np

    import jax.numpy as jnp

    from climb_tpu.ops.attention import multi_head_attention

    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(2, 96, 4, 16).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 96, 4, 16).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 96, 4, 16).astype(np.float32))
    a = multi_head_attention(q, k, v, impl="xla")
    b = multi_head_attention(q, k, v, impl="auto")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
