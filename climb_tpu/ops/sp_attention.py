"""Sequence-parallel attention: ring (blockwise) and Ulysses (head-scatter).

The reference's entire long-context story is ``reallocate_text_image``
(vilt.py:57-81) — single-device position-embedding tiling. These ops are the
TPU-native scaling path (SURVEY.md sections 2.10/5.7): shard the sequence
axis across the mesh and attend globally via ICI collectives.

- ``ring_attention``: each device holds a sequence shard of q/k/v; k/v blocks
  rotate around the ring via ``jax.lax.ppermute`` while a numerically-stable
  online-softmax accumulator builds the full-attention output — O(S/n) memory
  per device, communication fully overlappable with the block matmuls.
- ``ulysses_attention``: ``all_to_all`` scatters heads / gathers sequence so
  each device computes full-sequence attention for H/n heads, then the
  inverse all_to_all restores sequence sharding. Preferable when
  num_heads >= n_devices.

Both are called inside ``shard_map`` over a mesh axis; see
``sequence_parallel_attention`` for the driver-facing wrapper and
``tests/test_sp_attention.py`` for equivalence vs single-device attention.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e9


def _block_attend(q, k, v, bias_k, scale):
    """Partial attention of local q against one k/v block.

    Returns (unnormalized out, row-max m, row-sum l) for online-softmax
    accumulation. q: (B,Sq,H,D), k/v: (B,Sk,H,D), bias_k: (B,Sk).
    """
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    s = s + bias_k[:, None, None, :].astype(s.dtype)
    m = jnp.max(s, axis=-1)  # (B,H,Sq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)  # (B,H,Sq)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)
    return o, m, l


def ring_attention(q, k, v, bias_k, axis_name: str):
    """Blockwise ring attention over a sharded sequence axis.

    Inside shard_map: q/k/v are the LOCAL (B, S/n, H, D) shards; bias_k is
    the local (B, S/n) additive key bias (mask). Returns the local output
    shard of full-sequence attention.
    """
    n = jax.lax.psum(1, axis_name)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        (k_blk, v_blk, b_blk, o, m, l) = carry
        o_i, m_i, l_i = _block_attend(q, k_blk, v_blk, b_blk, scale)
        m_new = jnp.maximum(m, m_i)
        alpha = jnp.exp(m - m_new)   # rescale old accumulator
        beta = jnp.exp(m_i - m_new)  # rescale new block
        o = o * alpha.transpose(0, 2, 1)[..., None] + o_i * beta.transpose(0, 2, 1)[..., None]
        l = l * alpha + l_i * beta
        # rotate k/v/bias to the next ring neighbor (ICI ppermute)
        k_nxt = jax.lax.ppermute(k_blk, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_blk, axis_name, perm)
        b_nxt = jax.lax.ppermute(b_blk, axis_name, perm)
        return (k_nxt, v_nxt, b_nxt, o, m_new, l), None

    b, sq, h, d = q.shape
    # accumulators are device-varying (shard_map manual-axes typing)
    if hasattr(jax.lax, "pcast"):  # jax.lax.pvary is deprecated in its favor
        pvary = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")
    else:
        pvary = lambda x: jax.lax.pvary(x, (axis_name,))
    o0 = pvary(jnp.zeros((b, sq, h, d), jnp.float32))
    m0 = pvary(jnp.full((b, h, sq), NEG_INF, jnp.float32))
    l0 = pvary(jnp.zeros((b, h, sq), jnp.float32))
    carry = (k, v, bias_k, o0, m0, l0)
    carry, _ = jax.lax.scan(step, carry, None, length=n)
    _, _, _, o, m, l = carry
    out = o / jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def ulysses_attention(q, k, v, bias_k, axis_name: str):
    """Ulysses SP: all_to_all heads<->sequence, local full attention, inverse.

    Inside shard_map with local shards (B, S/n, H, D); requires H % n == 0.
    """
    n = jax.lax.psum(1, axis_name)

    def scatter_heads(x):
        # (B, S/n, H, D) -> (B, S, H/n, D): split heads, concat sequence
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1, tiled=True)

    def gather_heads(x):
        return jax.lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2, tiled=True)

    qh, kh, vh = scatter_heads(q), scatter_heads(k), scatter_heads(v)
    bias_full = jax.lax.all_gather(bias_k, axis_name, axis=1, tiled=True)  # (B, S)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) * scale
    s = s + bias_full[:, None, None, :].astype(s.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(vh.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return gather_heads(o)


def sequence_parallel_attention(q, k, v, mask, mesh: Mesh, axis_name: str = "model",
                                impl: str = "ring"):
    """Driver-facing wrapper: shard (B,S,H,D) tensors on S over `axis_name`
    and run ring/Ulysses attention; returns the full (replicated-batch)
    output. mask: (B, S) {0,1}."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    bias = (1.0 - mask.astype(jnp.float32)) * NEG_INF
    fn = ring_attention if impl == "ring" else ulysses_attention
    spec = P(None, axis_name, None, None)
    mapped = shard_map(
        functools.partial(fn, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec, P(None, axis_name)),
        out_specs=spec,
    )
    return mapped(q, k, v, bias)
