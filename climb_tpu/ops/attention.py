"""Multi-head attention: XLA reference implementation + Pallas TPU kernel.

Replaces the per-layer attention inside the reference's HF ``ViltModel``
(``transformers`` ``modeling_vilt.py`` ``ViltSelfAttention``) — scores scaled
by 1/sqrt(head_dim), additive mask bias, softmax, context matmul.

The XLA path is the numerics reference; the Pallas path
(``climb_tpu.ops.pallas_attention``) is a fused flash-attention-style kernel
used for the hot training loop. Both produce identical outputs within
tolerance (see ``tests/test_pallas_kernels.py``).
"""

from functools import partial

import jax
import jax.numpy as jnp

NEG_INF = -1e9  # large-negative mask bias; exp() underflows to exactly 0 in f32


def mask_to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """(B, S) {0,1} attention mask -> (B, 1, 1, S) additive bias."""
    return ((1.0 - mask.astype(jnp.float32)) * NEG_INF).astype(dtype)[:, None, None, :]


def mha_xla(q, k, v, bias=None):
    """Reference attention. q,k,v: (B, S, H, Dh). bias: broadcastable to (B,H,S,S)."""
    head_dim = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(head_dim, dtype=jnp.float32)).astype(q.dtype)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@partial(jax.jit, static_argnames=("impl",))
def multi_head_attention(q, k, v, bias=None, impl: str = "xla"):
    """Dispatch between the XLA reference and the Pallas fused kernel."""
    if impl == "pallas":
        from climb_tpu.ops.pallas_attention import flash_attention

        return flash_attention(q, k, v, bias)
    return mha_xla(q, k, v, bias)
