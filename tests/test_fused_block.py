"""Numerics of the fused attention sublayer (ops/pallas_block.py): the
attn_impl='fused_block' ViltBlock must match the 'xla' block — outputs and
gradients — on identical parameters (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.models.model_config import ViltConfig
from climb_tpu.models.vilt_core import ViltBlock
from climb_tpu.ops.attention import mask_to_bias
from climb_tpu.ops.pallas_block import _ref_compose, fused_attention_sublayer

B, S, D, HEADS = 2, 24, 64, 4


@pytest.fixture
def block_setup(rng):
    cfg = ViltConfig(
        vocab_size=100, hidden_size=D, num_layers=2, num_heads=HEADS,
        intermediate_size=D * 2, image_height=64, image_width=96,
        patch_size=32, pretrain_image_size=64,
    )
    x = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    mask = np.ones((B, S), np.float32)
    mask[1, S - 5:] = 0.0
    bias = mask_to_bias(jnp.asarray(mask))
    params = ViltBlock(cfg).init(jax.random.PRNGKey(0), x, bias)["params"]
    # non-trivial LN params so the fused LN path is actually exercised
    params = jax.tree_util.tree_map(lambda p: p, params)
    params["ln1"] = {
        "scale": jnp.asarray(1.0 + 0.1 * rng.randn(D).astype(np.float32)),
        "bias": jnp.asarray(0.1 * rng.randn(D).astype(np.float32)),
    }
    return cfg, params, x, bias


def test_fused_block_matches_xla(block_setup):
    cfg, params, x, bias = block_setup
    out_xla, _ = ViltBlock(cfg.replace(attn_impl="xla")).apply({"params": params}, x, bias)
    out_fused, _ = ViltBlock(cfg.replace(attn_impl="fused_block")).apply(
        {"params": params}, x, bias
    )
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), rtol=2e-5, atol=2e-5
    )


def test_fused_block_grads_match_xla(block_setup):
    cfg, params, x, bias = block_setup

    def loss(p, impl):
        out, _ = ViltBlock(cfg.replace(attn_impl=impl)).apply({"params": p}, x, bias)
        return (out.astype(jnp.float32) ** 2).mean()

    g_xla = jax.grad(lambda p: loss(p, "xla"))(params)
    g_fused = jax.grad(lambda p: loss(p, "fused_block"))(params)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_xla)
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    for (path, gx), (_, gf) in zip(flat_x, flat_f):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gx), rtol=5e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_kernel_matches_ref_compose(rng):
    """The pallas kernel (interpret) vs the XLA composition that defines its
    backward — padding path included (S=24 pads to 128)."""
    x = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    mk = lambda *shape: jnp.asarray(rng.randn(*shape).astype(np.float32) * 0.05)
    lns, lnb = 1.0 + mk(D), mk(D)
    wq, wk, wv, wo = mk(D, D), mk(D, D), mk(D, D), mk(D, D)
    bq, bk, bv, bo = mk(D), mk(D), mk(D), mk(D)
    mask = np.ones((B, S), np.float32)
    mask[0, S - 3:] = 0.0
    bias = mask_to_bias(jnp.asarray(mask))

    out = fused_attention_sublayer(
        x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, bias,
        num_heads=HEADS, eps=1e-12,
    )
    row = lambda t: t.reshape(1, -1)
    ref = _ref_compose(
        HEADS, 1e-12, x, row(lns), row(lnb), wq, row(bq), wk, row(bk),
        wv, row(bv), wo, row(bo), bias[:, 0, 0, :],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_fused_block_adapter_fallback(rng):
    """With mh-adapters active the fused kernel can't apply (adapter sits
    between out-proj and residual), so attn_impl='fused_block' must fall
    back to the standard attention path — outputs identical to 'xla'."""
    from climb_tpu.models.model_config import AdapterSpec

    cfg = ViltConfig(
        vocab_size=100, hidden_size=D, num_layers=2, num_heads=HEADS,
        intermediate_size=D * 2, image_height=64, image_width=96,
        patch_size=32, pretrain_image_size=64,
    )
    spec = AdapterSpec(mh_adapter=True, output_adapter=True, reduction_factor=4)
    x = jnp.asarray(rng.randn(B, S, D).astype(np.float32))
    bias = mask_to_bias(jnp.ones((B, S), jnp.float32))
    mk = lambda impl: ViltBlock(
        cfg.replace(attn_impl=impl), adapter_spec=spec,
        adapter_tasks=("snli-ve",), active_adapter="snli-ve",
    )
    params = mk("xla").init(jax.random.PRNGKey(0), x, bias)["params"]
    out_xla, _ = mk("xla").apply({"params": params}, x, bias)
    out_fused, _ = mk("fused_block").apply({"params": params}, x, bias)
    np.testing.assert_array_equal(np.asarray(out_fused), np.asarray(out_xla))


def test_fused_self_remat_gating():
    """fused_self_remat is only on for the exact supported configuration."""
    from climb_tpu.models.model_config import AdapterSpec

    base = ViltConfig(
        vocab_size=100, hidden_size=D, num_layers=2, num_heads=HEADS,
        intermediate_size=D * 2, image_height=64, image_width=96,
        patch_size=32, pretrain_image_size=64,
        attn_impl="fused_block", remat=True, remat_policy="selective",
    )
    assert ViltBlock.fused_self_remat(base, None)
    assert not ViltBlock.fused_self_remat(base.replace(attn_impl="xla"), None)
    assert not ViltBlock.fused_self_remat(base.replace(remat=False), None)
    assert not ViltBlock.fused_self_remat(base.replace(remat_policy="full"), None)
    assert not ViltBlock.fused_self_remat(base.replace(hidden_dropout=0.1), None)
    assert not ViltBlock.fused_self_remat(base, AdapterSpec(mh_adapter=True))
    # mlp-only adapters keep the fused attention path (and its self-remat)
    assert ViltBlock.fused_self_remat(base, AdapterSpec(mh_adapter=False))
