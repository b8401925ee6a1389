"""Patch embedding as reshape + matmul (conv-as-matmul, MXU-native).

The reference's patch embedding is a strided ``nn.Conv2d`` inside HF
``ViltPatchEmbeddings``. A stride-``p`` convolution with a ``p x p`` kernel is
exactly an unfold into non-overlapping patches followed by one dense matmul —
which maps directly onto the TPU MXU as a single large GEMM with no im2col
overhead (the unfold is a free reshape/transpose fused by XLA).
"""

import jax.numpy as jnp
import numpy as np


def patchify(pixel_values: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, (H//p)*(W//p), p*p*C), patches in row-major grid order.

    Per-patch feature order is (patch_row, patch_col, channel), matching
    ``conv_kernel_to_patch_kernel`` below.
    """
    b, h, w, c = pixel_values.shape
    p = patch_size
    gh, gw = h // p, w // p
    x = pixel_values.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, C)
    return x.reshape(b, gh * gw, p * p * c)


def conv_kernel_to_patch_kernel(conv_weight: np.ndarray) -> np.ndarray:
    """HF Conv2d weight (D, C, ph, pw) -> dense kernel (ph*pw*C, D).

    Flattening order (ph, pw, C) matches ``patchify``'s per-patch layout, so
    ``patchify(x) @ kernel + bias`` equals the strided convolution exactly.
    """
    d, c, ph, pw = conv_weight.shape
    return np.ascontiguousarray(conv_weight.transpose(2, 3, 1, 0).reshape(ph * pw * c, d))


def patch_grid_mask(patch_hw: jnp.ndarray, grid_h: int, grid_w: int) -> jnp.ndarray:
    """Per-sample valid-patch mask. patch_hw: (B, 2) valid (rows, cols) counts.

    Returns (B, grid_h*grid_w) float mask — 1 where the patch is inside the
    sample's valid (top-left anchored) region. Equivalent to HF ViLT's
    nearest-downsampled pixel_mask (``modeling_vilt.py`` ``visual_embed``).
    """
    rows = jnp.arange(grid_h)[None, :, None] < patch_hw[:, 0][:, None, None]
    cols = jnp.arange(grid_w)[None, None, :] < patch_hw[:, 1][:, None, None]
    return (rows & cols).reshape(patch_hw.shape[0], grid_h * grid_w).astype(jnp.float32)
