from climb_tpu.ops.attention import multi_head_attention
from climb_tpu.ops.patch_embed import patchify, conv_kernel_to_patch_kernel
from climb_tpu.ops.image_ops import normalize_images

__all__ = [
    "multi_head_attention",
    "patchify",
    "conv_kernel_to_patch_kernel",
    "normalize_images",
]
