"""On-device image normalization.

The reference normalizes pixels on the host inside ``ViltProcessor``
(mean=std=0.5 per channel, i.e. x/255 * 2 - 1 on uint8 input) every step
(``src/modeling/vilt.py:94-95``). Here images travel to the device as uint8
(4x less HBM/PCIe traffic than f32) and are normalized on-device; XLA fuses
the cast+scale into the patch-embedding producer. A Pallas variant exists for
explicit fusion control (``climb_tpu.ops.pallas_image.normalize_pallas``).
"""

import jax.numpy as jnp

# ViltImageProcessor defaults: image_mean = image_std = [0.5, 0.5, 0.5].
VILT_MEAN = 0.5
VILT_STD = 0.5


def normalize_images(pixels_u8: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (B, H, W, C) in [0,255] -> normalized float in [-1, 1]."""
    x = pixels_u8.astype(dtype) * (1.0 / 255.0)
    return (x - VILT_MEAN) / VILT_STD
