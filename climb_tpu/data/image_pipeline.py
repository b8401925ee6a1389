"""Host-side image preprocessing to fixed-shape uint8 canvases.

Replaces the reference's per-step, in-forward ``ViltProcessor`` preprocessing
(``src/modeling/vilt.py:83-96`` — the main-process hot-loop bottleneck,
SURVEY.md section 2.4) with ahead-of-time loader-side processing:

  decode -> ViLT resize (shortest edge 384, longest <= 640, dims floored to
  /32, bicubic) -> uint8 canvas (top-left anchored) + valid patch dims.

Normalization happens on-device (``climb_tpu.ops.image_ops``); the canvas
travels as uint8 (4x smaller transfers).

Deviation from the reference, documented: HF pads each *batch* to its max
dims, so portrait images can make the canvas up to 640 tall. Here the canvas
is fixed landscape (384, 640) for static shapes; portrait images are fit to
height <= 384 (proportionally fewer patches). A C++ fast path lives in
``climb_tpu.native``.
"""

from typing import Tuple

import numpy as np


def vilt_resize_dims(
    h: int,
    w: int,
    shorter: int = 384,
    longer: int = 640,
    size_divisor: int = 32,
    max_h: int = 384,
    max_w: int = 640,
) -> Tuple[int, int]:
    """Output (h, w) per ViltImageProcessor.get_resize_output_image_size,
    additionally capped to the fixed canvas."""
    scale = shorter / min(h, w)
    if h < w:
        new_h, new_w = shorter, scale * w
    else:
        new_h, new_w = scale * h, shorter
    if max(new_h, new_w) > longer:
        s = longer / max(new_h, new_w)
        new_h, new_w = new_h * s, new_w * s
    # canvas cap (portrait fit) — keeps shapes static on TPU
    if new_h > max_h:
        s = max_h / new_h
        new_h, new_w = max_h, new_w * s
    if new_w > max_w:
        s = max_w / new_w
        new_h, new_w = new_h * s, max_w
    new_h, new_w = int(new_h + 0.5), int(new_w + 0.5)
    new_h = max(size_divisor, new_h // size_divisor * size_divisor)
    new_w = max(size_divisor, new_w // size_divisor * size_divisor)
    return new_h, new_w


def process_image(
    image,
    canvas_hw: Tuple[int, int] = (384, 640),
    patch_size: int = 32,
    resample: str = "bicubic",
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """PIL image / HxWxC array -> (uint8 canvas (H,W,3), patch_hw).

    patch_hw = (valid_h // patch, valid_w // patch) — resize dims are always
    multiples of patch_size so the valid region tiles exactly.
    """
    from PIL import Image

    ch, cw = canvas_hw
    if not hasattr(image, "size"):
        image = Image.fromarray(np.asarray(image).astype(np.uint8))
    if image.mode != "RGB":
        image = image.convert("RGB")
    w, h = image.size
    nh, nw = vilt_resize_dims(h, w, max_h=ch, max_w=cw)

    if (nh, nw) != (h, w):
        try:
            filt = Image.BICUBIC if resample == "bicubic" else Image.BILINEAR
            image = image.resize((nw, nh), resample=filt)
        except Exception:
            # C++ path (climb_tpu/native/image_ops.cpp): bit-identical
            # PIL-compatible separable resampling straight into the canvas.
            from climb_tpu.native import resize_into_canvas

            canvas = resize_into_canvas(
                np.asarray(image, np.uint8)[:, :, :3], (nh, nw), (ch, cw), resample
            )
            if canvas is not None:
                return canvas, (nh // patch_size, nw // patch_size)
            raise
    arr = np.asarray(image, dtype=np.uint8)
    canvas = np.zeros((ch, cw, 3), np.uint8)
    canvas[:nh, :nw] = arr[:, :, :3]
    return canvas, (nh // patch_size, nw // patch_size)


def mean_image_canvas(
    mean_image, canvas_hw: Tuple[int, int] = (384, 640), patch_size: int = 32
):
    """Process the 'vacuous' mean image used by language-only tasks
    (reference train_language.py:67-69 with utils/coco_mean_image.png)."""
    return process_image(mean_image, canvas_hw, patch_size)
