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


def normalize_canvas_host(canvas_u8: np.ndarray) -> np.ndarray:
    """uint8 canvas -> normalized float32 in [-1, 1] on the host.

    The 'raw' ``visual_input_type`` variant (reference
    cocoimages_dataset.py:47-51: Resize + ToTensor + Normalize(0.5, 0.5) at
    load time). The op order matches ``ops.image_ops.normalize_images``
    exactly so host- and device-normalized pixels are bit-identical in f32.
    """
    x = canvas_u8.astype(np.float32) * np.float32(1.0 / 255.0)
    return (x - np.float32(0.5)) / np.float32(0.5)


def image_header_dims(path: str):
    """(h, w) of an image file from its header only — no pixel decode.

    Used by aspect bucketing to predict each example's resized canvas width
    ahead of loading. JPEGs go through the native header parser; everything
    else (and truncated-header fallback) uses PIL's lazy open, which reads
    metadata without decoding. Returns None when unreadable.
    """
    try:
        if path.lower().endswith((".jpg", ".jpeg")):
            from climb_tpu.native import jpeg_dims

            with open(path, "rb") as f:
                head = f.read(65536)
            dims = jpeg_dims(head)
            if dims is not None:
                return dims
        from PIL import Image

        with Image.open(path) as im:
            return im.height, im.width
    except Exception:
        return None


def predict_canvas_widths(paths_per_example, canvas_hw, cache_path=None,
                          memo=None):
    """Per-example needed canvas width (pixels) from image headers only —
    the aspect-bucketing hint. Applies the same ViLT resize rule the loading
    pipeline uses, so predictions match the loaded ``patch_hw`` exactly;
    unreadable headers conservatively claim the full canvas. ``memo`` (a
    path->dims dict) is updated in place; new entries are persisted to
    ``cache_path`` when given."""
    from climb_tpu.data.cache import load_pickle_cache, save_pickle_cache

    if memo is None:
        memo = {}
    if cache_path and not memo:
        memo.update(load_pickle_cache(cache_path, tolerant=True) or {})
    ch, cw = canvas_hw
    new = 0
    widths = np.empty((len(paths_per_example),), np.int64)
    for i, paths in enumerate(paths_per_example):
        w = 0
        for path in paths:
            if path not in memo:
                memo[path] = image_header_dims(path)
                new += 1
            dims = memo[path]
            if dims is None:
                w = max(w, cw)
            else:
                _, nw = vilt_resize_dims(dims[0], dims[1], max_h=ch, max_w=cw)
                w = max(w, nw)
        widths[i] = w
    if new and cache_path:
        save_pickle_cache(cache_path, memo)
    return widths


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
    if not hasattr(image, "mode"):  # raw array (note ndarray HAS .size)
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


def process_jpeg_file(
    path: str,
    canvas_hw: Tuple[int, int] = (384, 640),
    patch_size: int = 32,
    dct_prescale: bool = False,
):
    """Fully-native JPEG -> canvas path: C++ libjpeg decode
    (climb_tpu/native/jpeg_decode.cpp) + C++ PIL-bit-exact bicubic resample
    (climb_tpu/native/image_ops.cpp). Returns None when the native libraries
    are unavailable or the file needs PIL (e.g. CMYK) — callers fall back to
    ``process_image``.

    dct_prescale=True additionally decodes big photos at a reduced DCT-domain
    scale (the smallest scale8/8 that still covers the target dims — like
    PIL's Image.draft). Faster, but then the resample input differs from the
    full-resolution decode, so it is opt-in and off for parity-critical runs.
    """
    from climb_tpu.native import decode_jpeg, jpeg_dims, resize_into_canvas

    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    dims = jpeg_dims(data)
    if dims is None:
        return None
    h, w = dims
    if h < 1 or w < 1:
        return None
    ch, cw = canvas_hw
    nh, nw = vilt_resize_dims(h, w, max_h=ch, max_w=cw)

    scale8 = 8
    if dct_prescale:
        while scale8 > 1 and ((h * (scale8 - 1) + 7) // 8 >= nh
                              and (w * (scale8 - 1) + 7) // 8 >= nw):
            scale8 -= 1
    img = decode_jpeg(data, scale8)
    if img is None:
        return None
    if img.shape[:2] == (nh, nw):
        canvas = np.zeros((ch, cw, 3), np.uint8)
        canvas[:nh, :nw] = img
        return canvas, (nh // patch_size, nw // patch_size)
    canvas = resize_into_canvas(img, (nh, nw), (ch, cw), "bicubic")
    if canvas is None:
        return None
    return canvas, (nh // patch_size, nw // patch_size)


def mean_image_canvas(
    mean_image, canvas_hw: Tuple[int, int] = (384, 640), patch_size: int = 32
):
    """Process the 'vacuous' mean image used by language-only tasks
    (reference train_language.py:67-69 with utils/coco_mean_image.png)."""
    return process_image(mean_image, canvas_hw, patch_size)
