"""Fused multi-head attention as a Pallas TPU kernel (forward + custom VJP).

Replaces the reference's HF ``ViltSelfAttention`` (cuBLAS matmuls with an
HBM-materialized (B,H,S,S) probability tensor — the memory hog that forces
rematerialization at batch 64 on a 16G chip).

Design: ViLT sequences are short (40 text + 241 image = 281 tokens, padded to
a 128-multiple), so the ENTIRE (S,S) score matrix for one (batch, head) fits
comfortably in VMEM (384x384 f32 = 590KB). One grid program per (batch, head)
computes scores -> masked softmax -> context fully on-chip — no online
softmax bookkeeping needed, no HBM round-trip for probabilities. The backward
kernel recomputes probabilities in VMEM and emits dq/dk/dv in one pass
(classic flash-attention-style recompute, specialized to whole-sequence
blocks).

Layout: q/k/v stay in their natural (B, S, H*D) layout; the grid indexes
(batch, head) and block specs slice the head's D columns — no transposes hit
HBM. Padding rows (S -> S_pad) are masked via the additive key bias and
sliced off by the wrapper.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[0, 0]  # (S, D)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / l).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_ref[0, 0][None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l  # (S, S) f32

    p_lp = p.astype(do.dtype)
    # dV = P^T dO
    dv = jax.lax.dot_general(
        p_lp, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dP = dO V^T
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    # dK = dS^T Q
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


def _qkv_spec(s_pad, head_dim, num_heads):
    # array layout (B, H, S_pad, D); one (1, 1, S_pad, D) block per (b, h).
    # D is the full trailing dim, satisfying the TPU lowering's
    # last-dim-divisible-by-128-or-full constraint for head_dim 64.
    return pl.BlockSpec(
        (1, 1, s_pad, head_dim),
        lambda b, h: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )


def _bias_spec(s_pad):
    # bias array (B, 1, S_pad): the singleton middle dim keeps the block's
    # second-to-last dim equal to the full array dim (TPU tiling constraint).
    return pl.BlockSpec((1, 1, s_pad), lambda b, h: (b, 0, 0), memory_space=pltpu.VMEM)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q, k, v, bias=None):
    """Fused attention. q,k,v: (B, S, H, D); bias broadcastable (B,1,1,S).

    Returns (B, S, H, D) context, numerically matching
    ``climb_tpu.ops.attention.mha_xla``.
    """
    out, _ = _fa_fwd(q, k, v, bias)
    return out


def _prep(q, k, v, bias):
    b, s, h, d = q.shape
    s_pad = _round_up(s, 128)
    kb = jnp.zeros((b, 1, s_pad), jnp.float32)
    if bias is not None:
        kb = kb.at[:, 0, :s].set(bias[:, 0, 0, :].astype(jnp.float32))
    else:
        kb = kb.at[:, :, s:].set(NEG_INF)
    if bias is not None and s_pad > s:
        kb = kb.at[:, :, s:].set(NEG_INF)

    def pack(x):
        x = x.transpose(0, 2, 1, 3)  # (B, H, S, D)
        if s_pad > s:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        return x

    return pack(q), pack(k), pack(v), kb, (b, s, h, d, s_pad)


def _fa_fwd(q, k, v, bias):
    qp, kp, vp, kb, (b, s, h, d, s_pad) = _prep(q, k, v, bias)
    scale = 1.0 / (d**0.5)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[
            _qkv_spec(s_pad, d, h),
            _qkv_spec(s_pad, d, h),
            _qkv_spec(s_pad, d, h),
            _bias_spec(s_pad),
        ],
        out_specs=_qkv_spec(s_pad, d, h),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
        interpret=_interpret(),
    )(qp, kp, vp, kb)
    out = out[:, :, :s].transpose(0, 2, 1, 3)
    return out, (q, k, v, bias)


def _fa_bwd(residuals, g):
    q, k, v, bias = residuals
    qp, kp, vp, kb, (b, s, h, d, s_pad) = _prep(q, k, v, bias)
    gp = g.transpose(0, 2, 1, 3)
    if s_pad > s:
        gp = jnp.pad(gp, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
    scale = 1.0 / (d**0.5)
    spec = _qkv_spec(s_pad, d, h)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[spec, spec, spec, _bias_spec(s_pad), spec],
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, s_pad, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, d), v.dtype),
        ),
        interpret=_interpret(),
    )(qp, kp, vp, kb, gp)

    def unpack(x):
        return x[:, :, :s].transpose(0, 2, 1, 3)

    return unpack(dq), unpack(dk), unpack(dv), None


flash_attention.defvjp(_fa_fwd, _fa_bwd)
