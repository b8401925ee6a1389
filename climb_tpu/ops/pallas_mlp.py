"""Fused MLP (Dense -> bias -> exact GELU -> Dense -> bias) Pallas kernel.

The transformer block's FFN as a single kernel: both GEMMs hit the MXU with
the bias-add and erf-GELU fused on the VPU between them — the (rows, 4D)
intermediate never round-trips to HBM. XLA's fusion already achieves most of
this on TPU, so the XLA path stays the default; this kernel exists as the
explicit-fusion variant (cfg.mlp_impl='pallas') and the pattern for deeper
block fusion.

Grid: rows are tiled (batch*seq folded); weights are broadcast to every
program. VMEM per program at TILE=256, D=768: x(256x768f32)=0.8MB +
w1(768x3072 bf16)=4.7MB + h(256x3072)=3.1MB + w2=4.7MB — fits the 16MB
budget.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz-Stegun 7.1.26 polynomial erf (|err| <= 1.5e-7).

    Mosaic implements neither erf nor erfc; this uses only exp, which it
    does. Good to ~1e-7 — far below bf16 resolution.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429,
    )
    p = 0.3275911
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _erf_gelu(x):
    # exact-GELU formulation via the polynomial erf above
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
    x = x_ref[...]
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = _erf_gelu(h).astype(x.dtype)
    o = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32)
    o = o + b2_ref[...].astype(jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def fused_mlp(x, w1, b1, w2, b2, tile_rows: int = 256):
    """x: (..., D); w1: (D, F); w2: (F, D). Returns (..., D).

    Differentiable: forward is the fused Pallas kernel; backward is XLA
    einsums that *recompute* the (rows, F) intermediate from the saved
    inputs (remat-style — the big activation is never stored), matching
    the selective-remat training configuration.
    """
    return _fused_mlp_vjp(x, w1, b1, w2, b2, tile_rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused_mlp_vjp(x, w1, b1, w2, b2, tile_rows):
    return _fused_mlp_impl(x, w1, b1, w2, b2, tile_rows)


def _fused_mlp_fwd(x, w1, b1, w2, b2, tile_rows):
    return _fused_mlp_impl(x, w1, b1, w2, b2, tile_rows), (x, w1, b1, w2)


def _gelu_grad(h):
    # d/dh [0.5 h (1 + erf(h/sqrt2))] = 0.5 (1 + erf(h/sqrt2)) + h pdf(h)
    inv_sqrt2 = 0.7071067811865476
    pdf = jnp.exp(-0.5 * h * h) * 0.3989422804014327
    return 0.5 * (1.0 + jax.lax.erf(h * inv_sqrt2)) + h * pdf


def _fused_mlp_bwd(tile_rows, res, dy):
    x, w1, b1, w2 = res
    orig_shape = x.shape
    d = x.shape[-1]
    x2 = x.reshape(-1, d)
    dy2 = dy.reshape(-1, d)
    # recompute the intermediate in f32 (never materialized in forward)
    h1 = (
        jnp.dot(x2, w1, preferred_element_type=jnp.float32)
        + b1.astype(jnp.float32)
    )
    g = _erf_gelu(h1).astype(x.dtype)
    dg = jnp.dot(dy2, w2.T, preferred_element_type=jnp.float32)
    dh1 = (dg * _gelu_grad(h1)).astype(x.dtype)
    dx = jnp.dot(dh1, w1.T, preferred_element_type=jnp.float32).astype(x.dtype)
    dw1 = jnp.dot(x2.T, dh1, preferred_element_type=jnp.float32).astype(w1.dtype)
    db1 = dh1.astype(jnp.float32).sum(0).astype(b1.dtype)
    dw2 = jnp.dot(g.T, dy2, preferred_element_type=jnp.float32).astype(w2.dtype)
    db2 = dy2.astype(jnp.float32).sum(0).astype(b1.dtype)
    return dx.reshape(orig_shape), dw1, db1, dw2, db2


_fused_mlp_vjp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)


def _fused_mlp_impl(x, w1, b1, w2, b2, tile_rows: int = 256):
    orig_shape = x.shape
    d = x.shape[-1]
    f = w1.shape[-1]
    rows = 1
    for s in orig_shape[:-1]:
        rows *= s
    x2 = x.reshape(rows, d)
    pad = (-rows) % tile_rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
    n_tiles = x2.shape[0] // tile_rows

    out = pl.pallas_call(
        _mlp_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x2.shape[0], d), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(x2, w1, b1, w2, b2)
    if pad:
        out = out[:rows]
    return out.reshape(orig_shape)
