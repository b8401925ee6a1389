"""Fused multi-head attention as a Pallas TPU kernel (forward + custom VJP).

Replaces the reference's HF ``ViltSelfAttention`` (cuBLAS matmuls with an
HBM-materialized (B,H,S,S) probability tensor — the memory hog that forces
rematerialization at batch 64 on a 16G chip).

Two regimes, dispatched on padded sequence length:

- S_pad <= WHOLE_SEQ_MAX (the ViLT regime: 40 text + 241 image = 281 tokens):
  the ENTIRE (S,S) score matrix for one (batch, head) fits in VMEM (384x384
  f32 = 590KB). One grid program per (batch, head) computes scores -> masked
  softmax -> context fully on-chip — no online-softmax bookkeeping, no HBM
  round-trip for probabilities. Backward recomputes probabilities in VMEM and
  emits dq/dk/dv in one pass.
- S_pad > WHOLE_SEQ_MAX (the long-text `reallocate_text_image` regime):
  a KV-blocked online-softmax forward kernel (grid (B,H,nQ,nK), VMEM scratch
  accumulators across the sequential nK axis — classic flash attention;
  measured on v5e: 1.47x XLA at S=2048, 1.76x at S=4096, where the whole-seq
  kernel OOMs VMEM; the whole-seq kernel itself is 1.45x XLA at S=1024).
  Backward is a blockwise lax.scan in XLA that never materializes the
  (B,H,S,S) tensor (per-step memory O(BQ*S)).

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

# Above this padded sequence length the whole-(S,S)-scores-in-VMEM kernel no
# longer fits (1024^2 f32 = 4MB scores + q/k/v blocks); dispatch switches to
# the KV-blocked online-softmax kernel below. Module-level so tests can force
# the blocked path at small sizes.
WHOLE_SEQ_MAX = 1024
# (1024, 1024) measured fastest on v5e: 1.47x XLA at S=2048, 1.76x at S=4096
# (512-blocks lose ~45% to extra online-softmax rescales + grid overhead).
BLOCK_Q = 1024
BLOCK_K = 1024


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


def _fwd_kernel_blocked(
    q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, nk
):
    """KV-blocked flash-attention forward: grid (B, H, nQ, nK) with the nK
    axis sequential ('arbitrary'); m/l/acc accumulate in VMEM scratch across
    the KV loop (online softmax)."""
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # (BQ, D)
    k = k_ref[0, 0]  # (BK, D)
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale + bias_ref[0, 0][None, :]
    m_prev = m_scr[:, :1]  # (BQ, 1)
    l_prev = l_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0, 0] = (acc_scr[...] / jnp.maximum(l_scr[:, :1], 1e-30)).astype(
            o_ref.dtype
        )


def _fa_fwd_blocked(qp, kp, vp, kb, b, h, d, s_pad, scale, out_dtype):
    bq = min(BLOCK_Q, s_pad)
    bk = min(BLOCK_K, s_pad)
    nq, nk = s_pad // bq, s_pad // bk
    qkv_block = lambda blk, pick: pl.BlockSpec(
        (1, 1, blk, d), pick, memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel_blocked, scale=scale, nk=nk),
        grid=(b, h, nq, nk),
        in_specs=[
            qkv_block(bq, lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
            qkv_block(bk, lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
            qkv_block(bk, lambda b_, h_, qi, ki: (b_, h_, ki, 0)),
            pl.BlockSpec(
                (1, 1, bk), lambda b_, h_, qi, ki: (b_, 0, ki),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=qkv_block(bq, lambda b_, h_, qi, ki: (b_, h_, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(qp, kp, vp, kb)


def _bwd_blockwise_xla(q, k, v, bias, o, g):
    """Flash-attention backward for the blocked (long-S) regime, expressed as
    a lax.scan over query blocks in plain XLA: per step only (B,H,BQ,S)
    score/probability blocks materialize (never the full (B,H,S,S)).

    q/k/v/o/g: (B, S, H, D); bias: (B,1,1,S) or None. Returns dq, dk, dv.
    """
    b_, s, h, d = q.shape
    scale = 1.0 / (d**0.5)
    bq = min(BLOCK_Q, s)
    pad = (-s) % bq
    if pad:
        padded = lambda x: jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        q, o, g = padded(q), padded(o), padded(g)
    sp = q.shape[1]
    nq = sp // bq
    kbias = jnp.zeros((b_, s), jnp.float32) if bias is None else bias[:, 0, 0, :].astype(jnp.float32)

    # global row-wise log-sum-exp, blockwise over KV (memory O(S*BK))
    bk = min(BLOCK_K, s)
    kpad = (-s) % bk
    k_b = jnp.pad(k, ((0, 0), (0, kpad), (0, 0), (0, 0))) if kpad else k
    v_b = jnp.pad(v, ((0, 0), (0, kpad), (0, 0), (0, 0))) if kpad else v
    kb_b = jnp.pad(kbias, ((0, 0), (0, kpad)), constant_values=NEG_INF) if kpad else kbias
    nk = k_b.shape[1] // bk
    k_blocks = k_b.reshape(b_, nk, bk, h, d).transpose(1, 0, 2, 3, 4)
    kb_blocks = kb_b.reshape(b_, nk, bk).transpose(1, 0, 2)

    def lse_step(carry, xs):
        m_run, l_run = carry
        k_i, kb_i = xs
        s_i = jnp.einsum("bqhd,bkhd->bhqk", q, k_i) * scale + kb_i[:, None, None, :]
        m_i = jnp.max(s_i, axis=-1)
        m_new = jnp.maximum(m_run, m_i)
        l_new = l_run * jnp.exp(m_run - m_new) + jnp.sum(
            jnp.exp(s_i - m_new[..., None]), axis=-1
        )
        return (m_new, l_new), None

    m0 = jnp.full((b_, h, sp), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b_, h, sp), jnp.float32)
    (m_fin, l_fin), _ = jax.lax.scan(lse_step, (m0, l0), (k_blocks, kb_blocks))
    lse = m_fin + jnp.log(jnp.maximum(l_fin, 1e-30))  # (B,H,SP)

    delta = jnp.einsum("bqhd,bqhd->bhq", g.astype(jnp.float32), o.astype(jnp.float32))

    q_blocks = q.reshape(b_, nq, bq, h, d).transpose(1, 0, 2, 3, 4)
    g_blocks = g.reshape(b_, nq, bq, h, d).transpose(1, 0, 2, 3, 4)
    lse_blocks = lse.reshape(b_, h, nq, bq).transpose(2, 0, 1, 3)
    delta_blocks = delta.reshape(b_, h, nq, bq).transpose(2, 0, 1, 3)

    def q_step(carry, xs):
        dk_acc, dv_acc = carry
        q_i, g_i, lse_i, delta_i = xs
        s_i = jnp.einsum("bqhd,bkhd->bhqk", q_i, k) * scale + kbias[:, None, None, :]
        p_i = jnp.exp(s_i - lse_i[..., None])
        dp_i = jnp.einsum("bqhd,bkhd->bhqk", g_i.astype(jnp.float32), v.astype(jnp.float32))
        ds_i = p_i * (dp_i - delta_i[..., None]) * scale
        dq_i = jnp.einsum("bhqk,bkhd->bqhd", ds_i, k.astype(jnp.float32))
        dk_acc = dk_acc + jnp.einsum("bhqk,bqhd->bkhd", ds_i, q_i.astype(jnp.float32))
        dv_acc = dv_acc + jnp.einsum("bhqk,bqhd->bkhd", p_i, g_i.astype(jnp.float32))
        return (dk_acc, dv_acc), dq_i

    zeros_kv = jnp.zeros((b_, s, h, d), jnp.float32)
    (dk, dv), dq_blocks = jax.lax.scan(
        q_step, (zeros_kv, zeros_kv), (q_blocks, g_blocks, lse_blocks, delta_blocks)
    )
    dq = dq_blocks.transpose(1, 0, 2, 3, 4).reshape(b_, sp, h, d)[:, :s]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


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
    if s_pad > WHOLE_SEQ_MAX:
        out = _fa_fwd_blocked(qp, kp, vp, kb, b, h, d, s_pad, scale, q.dtype)
    else:
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
    return out, (q, k, v, bias, out)


def _fa_bwd(residuals, g):
    q, k, v, bias, out = residuals
    if _round_up(q.shape[1], 128) > WHOLE_SEQ_MAX:
        dq, dk, dv = _bwd_blockwise_xla(q, k, v, bias, out, g)
        return dq, dk, dv, None
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
