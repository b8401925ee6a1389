"""Pallas on-device image normalization kernel.

The device-side half of the input pipeline (host resizes/pads to the uint8
canvas; this normalizes on-chip). XLA fuses the equivalent jnp expression
into the patch-embed producer automatically — this kernel exists for explicit
fusion control and as the pattern for device-side preprocessing
(SURVEY.md section 2.9 item 3). Numerics match
``climb_tpu.ops.image_ops.normalize_images`` exactly.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from climb_tpu.ops.image_ops import VILT_MEAN, VILT_STD


def _normalize_kernel(u8_ref, out_ref, *, scale, shift):
    # Mosaic lacks a direct uint8->f32 cast; widen through int32 first.
    x = u8_ref[...].astype(jnp.int32).astype(jnp.float32) * scale + shift
    out_ref[...] = x.astype(out_ref.dtype)


def normalize_pallas(pixels_u8: jax.Array, dtype=jnp.float32) -> jax.Array:
    """uint8 (B, H, W, C) -> normalized float in [-1, 1], one row-block per
    grid step (W*C is lane-dim friendly: 640*3 = 1920 = 15 * 128)."""
    b, h, w, c = pixels_u8.shape
    flat = pixels_u8.reshape(b, h, w * c)
    scale = 1.0 / (255.0 * VILT_STD)
    shift = -VILT_MEAN / VILT_STD
    out = pl.pallas_call(
        functools.partial(_normalize_kernel, scale=scale, shift=shift),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w * c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w * c), dtype),
        interpret=jax.default_backend() != "tpu",
    )(flat)
    return out.reshape(b, h, w, c)
