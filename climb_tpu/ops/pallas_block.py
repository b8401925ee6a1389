"""Fused attention sublayer — ONE Pallas kernel per transformer layer.

Computes ``x + Wo @ MHA(LN1(x) Wq, LN1(x) Wk, LN1(x) Wv)`` (the whole
pre-norm attention sublayer of a ViLT block, HF ``ViltLayer`` semantics)
in a single ``pallas_call``: LayerNorm statistics in f32, three D x D
projections, per-head softmax attention with the additive key bias, output
projection, residual add — all without round-tripping intermediates through
HBM.

Motivation (VERDICT r1 / docs/PERF.md): at ViLT's S=281 the per-op Pallas
attention kernel LOSES ~20% to XLA (layout transposes + per-(b,h) program
overhead) and the attention stack runs at 46% MFU vs the MLP stack's 52%.
This kernel attacks that gap by fusing at the sublayer level instead: the
grid is one program per batch row, every matmul inside is a large MXU GEMM
on the (S_pad, D) tile resident in VMEM, and the per-op kernel's
(B,S,H,D) -> (B,H,S,D) transposes never happen.

Numerics: bf16 (or f32) inputs, f32 accumulation on every GEMM
(``preferred_element_type``), f32 LayerNorm statistics and softmax — matching
``ops.attention.mha_xla``'s f32 softmax.

Backward: the kernel SAVES its intermediates (h = LN1(x), q, k, v) to HBM
(~150 MB at ViLT-base shapes — ~0.2 ms of HBM writes, negligible), so the
custom VJP only recomputes the O(S^2) attention probabilities (scores +
softmax + context, ~13% of sublayer FLOPs) and handles the linear layers'
gradients with exact manual GEMMs. This matches the selective-remat
baseline's backward cost instead of paying a full forward recompute: the
naive recompute-everything VJP measured 539 ex/s vs the 644 ex/s XLA
baseline at the best train config even though the fused forward alone is
1.44x faster than XLA (15.6 vs 22.4 ms per 12-layer stack).

VMEM budget per program at ViLT-base shapes (S_pad=384, D=768, bf16):
x 0.56MB + LN/QKV intermediates ~2.3MB + 4 weight matrices 4.5MB + one
(384,384) f32 score tile 0.59MB + context/out ~1.7MB ~= 10MB < 16MB.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(
    x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref,
    wo_ref, bo_ref, kb_ref, o_ref, h_ref, q_ref, k_ref, v_ref,
    *, num_heads: int, eps: float, scale: float
):
    x = x_ref[0]  # (S_pad, D), compute dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = (xf - mu) * jax.lax.rsqrt(var + eps)
    h = h * lns_ref[0][None, :] + lnb_ref[0][None, :]
    h = h.astype(x.dtype)
    h_ref[0] = h

    def proj(w_ref, b_ref):
        y = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
        return (y + b_ref[0][None, :]).astype(x.dtype)

    q = proj(wq_ref, bq_ref)
    k = proj(wk_ref, bk_ref)
    v = proj(wv_ref, bv_ref)
    q_ref[0], k_ref[0], v_ref[0] = q, k, v

    kb = kb_ref[0, 0][None, :]  # (1, S_pad) f32 additive key bias
    d = x.shape[-1]
    dh = d // num_heads
    ctx_parts = []
    # static per-head loop: one (S_pad, S_pad) f32 score tile live at a time
    for head in range(num_heads):
        sl = slice(head * dh, (head + 1) * dh)
        sc = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sc = sc * scale + kb
        m = jnp.max(sc, axis=-1, keepdims=True)
        p = jnp.exp(sc - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        ctx_parts.append(
            jnp.dot(p.astype(x.dtype), v[:, sl], preferred_element_type=jnp.float32)
        )
    ctx = jnp.concatenate(ctx_parts, axis=-1).astype(x.dtype)

    out = jnp.dot(ctx, wo_ref[...], preferred_element_type=jnp.float32)
    out = out + bo_ref[0][None, :]
    o_ref[0] = (xf + out).astype(o_ref.dtype)


def _ref_compose(num_heads, eps, x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, kb):
    """The identical composition in plain XLA — defines the backward math
    (and the numerics tests' reference)."""
    b, s, d = x.shape
    dh = d // num_heads
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    h = ((xf - mu) * jax.lax.rsqrt(var + eps) * lns[0] + lnb[0]).astype(x.dtype)

    def proj(w, bias):
        y = jnp.dot(h, w, preferred_element_type=jnp.float32) + bias[0]
        return y.astype(x.dtype).reshape(b, s, num_heads, dh)

    q, k, v = proj(wq, bq), proj(wk, bk), proj(wv, bv)
    sc = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / dh**0.5) + kb[:, None, None, :]
    p = jax.nn.softmax(sc, axis=-1).astype(x.dtype)
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", p, v, preferred_element_type=jnp.float32
    ).astype(x.dtype).reshape(b, s, d)
    out = jnp.dot(ctx, wo, preferred_element_type=jnp.float32) + bo[0]
    return (xf + out).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _fused(num_heads, eps, x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, kb):
    out, _ = _fused_fwd(num_heads, eps, x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, kb)
    return out


def _fused_fwd(num_heads, eps, x, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, kb):
    b, s, d = x.shape
    # rows only need sublane alignment (16 for bf16); Mosaic pads the lane
    # (128) granularity internally. 281 -> 288 instead of 384 saves 25% of
    # every GEMM's row work vs mult-of-128 padding.
    s_pad = _round_up(s, 16)
    xp = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad > s else x
    kbp = (
        jnp.pad(kb, ((0, 0), (0, s_pad - s)), constant_values=NEG_INF)
        if s_pad > s else kb
    )
    # (B, 1, S_pad): the singleton middle dim keeps the block's second-to-last
    # dim equal to the full array dim (TPU lowering tiling constraint)
    kbp = kbp[:, None, :]
    scale = 1.0 / ((d // num_heads) ** 0.5)
    row = lambda: pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat = lambda din: pl.BlockSpec((din, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bsd = lambda: pl.BlockSpec((1, s_pad, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out, h, q, k, v = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, eps=eps, scale=scale),
        grid=(b,),
        in_specs=[
            bsd(),
            row(), row(),                      # LN scale/bias
            mat(d), row(), mat(d), row(),      # Wq/bq, Wk/bk
            mat(d), row(), mat(d), row(),      # Wv/bv, Wo/bo
            pl.BlockSpec((1, 1, s_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(bsd(), bsd(), bsd(), bsd(), bsd()),
        out_shape=tuple(
            jax.ShapeDtypeStruct((b, s_pad, d), x.dtype) for _ in range(5)
        ),
        interpret=_interpret(),
    )(xp, lns, lnb, wq, bq, wk, bk, wv, bv, wo, bo, kbp)
    out = out[:, :s]
    res = (x, h[:, :s], q[:, :s], k[:, :s], v[:, :s],
           lns, lnb, wq, wk, wv, wo, kb)
    return out, res


def _attn_core(num_heads, scale, q, k, v, kb):
    """(B,S,D) q/k/v + (B,S) key bias -> (B,S,D) context. The only piece of
    forward recomputed in backward (O(S^2), ~13% of sublayer FLOPs); its VJP
    supplies the exact softmax/attention gradients."""
    b, s, d = q.shape
    dh = d // num_heads
    r = lambda t: t.reshape(b, s, num_heads, dh)
    sc = jnp.einsum(
        "bqhd,bkhd->bhqk", r(q), r(k), preferred_element_type=jnp.float32
    ) * scale + kb[:, None, None, :]
    p = jax.nn.softmax(sc, axis=-1).astype(q.dtype)
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", p, r(v), preferred_element_type=jnp.float32
    ).astype(q.dtype)
    return ctx.reshape(b, s, d)


def _fused_bwd(num_heads, eps, residuals, g):
    """Manual backward from the kernel-saved intermediates. Linear layers get
    exact closed-form GEMM gradients; attention goes through jax.vjp of
    `_attn_core` (recompute limited to scores+softmax+context); LayerNorm
    through jax.vjp of the f32-stats normalization. No full-forward
    recompute — this is what lets fused_block beat the selective-remat
    baseline in training, not just forward."""
    x, h, q, k, v, lns, lnb, wq, wk, wv, wo, kb = residuals
    d = x.shape[-1]
    scale = 1.0 / ((d // num_heads) ** 0.5)
    gsum = lambda t: t.astype(jnp.float32).sum(axis=(0, 1)).reshape(1, d)

    # out-projection: y = x + ctx @ wo + bo
    ctx, attn_vjp = jax.vjp(
        functools.partial(_attn_core, num_heads, scale), q, k, v, kb
    )
    dbo = gsum(g)
    dwo = jnp.einsum(
        "bsd,bse->de", ctx, g, preferred_element_type=jnp.float32
    ).astype(wo.dtype)
    dctx = jnp.einsum(
        "bse,de->bsd", g, wo, preferred_element_type=jnp.float32
    ).astype(g.dtype)

    dq, dk, dv, dkb = attn_vjp(dctx)

    # q/k/v projections: q = h @ wq + bq (and k, v alike)
    dwq = lambda dt: jnp.einsum(
        "bsd,bse->de", h, dt, preferred_element_type=jnp.float32
    ).astype(wq.dtype)
    dh = jnp.einsum(
        "bse,de->bsd", dq.astype(jnp.float32), wq.astype(jnp.float32)
    )
    dh += jnp.einsum("bse,de->bsd", dk.astype(jnp.float32), wk.astype(jnp.float32))
    dh += jnp.einsum("bse,de->bsd", dv.astype(jnp.float32), wv.astype(jnp.float32))

    # LayerNorm: h = LN(x) * lns + lnb, f32 stats (recompute is elementwise)
    def ln(x, lns, lnb):
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
        return (xf - mu) * jax.lax.rsqrt(var + eps) * lns[0] + lnb[0]

    _, ln_vjp = jax.vjp(ln, x, lns, lnb)
    dx_ln, dlns, dlnb = ln_vjp(dh.astype(jnp.float32))

    dx = g + dx_ln.astype(g.dtype)
    return (dx, dlns, dlnb,
            dwq(dq), gsum(dq), dwq(dk), gsum(dk), dwq(dv), gsum(dv),
            dwo, dbo, dkb.astype(jnp.float32))


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention_sublayer(
    x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wo, bo, mask_bias,
    *, num_heads: int, eps: float = 1e-12
):
    """x: (B, S, D); mask_bias: (B, 1, 1, S) additive or None; weights (D, D)
    in the compute dtype; 1-D params as raw (D,) f32 (reshaped here).
    Returns (B, S, D) = x + attention-sublayer output."""
    b, s, _ = x.shape
    kb = (
        jnp.zeros((b, s), jnp.float32)
        if mask_bias is None else mask_bias[:, 0, 0, :].astype(jnp.float32)
    )
    as_row = lambda t: t.reshape(1, -1).astype(jnp.float32)
    return _fused(
        num_heads, eps, x,
        as_row(ln_scale), as_row(ln_bias),
        wq, as_row(bq), wk, as_row(bk), wv, as_row(bv), wo, as_row(bo), kb,
    )
