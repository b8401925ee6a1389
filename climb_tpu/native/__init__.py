"""ctypes bindings for the native host-pipeline components.

- ``NativeWordPieceTokenizer`` — C++ WordPiece (ASCII fast path; transparent
  Python fallback per call for non-ASCII text and entirely when the .so is
  missing). Same encode()/batch_encode() surface as the Python tokenizer.
- ``resize_into_canvas`` — PIL-compatible C++ separable resampling straight
  into the fixed uint8 canvas.

Build with ``python -m climb_tpu.native.build``.
"""

import ctypes
import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)
_HERE = os.path.dirname(os.path.abspath(__file__))


def _load(name: str):
    path = os.path.join(_HERE, name)
    if not os.path.exists(path):
        return None
    try:
        return ctypes.CDLL(path)
    except OSError as e:
        logger.warning("failed to load %s: %s", name, e)
        return None


_tok_lib = _load("libclimb_tokenizer.so")
_img_lib = _load("libclimb_image.so")
_jpg_lib = _load("libclimb_jpeg.so")

if _tok_lib is not None:
    _tok_lib.wp_create.restype = ctypes.c_void_p
    _tok_lib.wp_create.argtypes = [ctypes.c_char_p]
    _tok_lib.wp_destroy.argtypes = [ctypes.c_void_p]
    _tok_lib.wp_encode.restype = ctypes.c_int
    _tok_lib.wp_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
    ]
    for fn in ("wp_pad_id", "wp_sep_id", "wp_cls_id"):
        getattr(_tok_lib, fn).restype = ctypes.c_int32
        getattr(_tok_lib, fn).argtypes = [ctypes.c_void_p]

if _img_lib is not None:
    _img_lib.img_resize_into_canvas.restype = ctypes.c_int
    _img_lib.img_resize_into_canvas.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]


if _jpg_lib is not None:
    _jpg_lib.jpg_dims.restype = ctypes.c_int
    _jpg_lib.jpg_dims.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    _jpg_lib.jpg_decode.restype = ctypes.c_int
    _jpg_lib.jpg_decode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]


def native_available() -> dict:
    return {
        "tokenizer": _tok_lib is not None,
        "image": _img_lib is not None,
        "jpeg": _jpg_lib is not None,
    }


def jpeg_dims(data: bytes):
    """(height, width) from the JPEG header, or None if unavailable/invalid."""
    if _jpg_lib is None:
        return None
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    h, w = ctypes.c_int(), ctypes.c_int()
    if _jpg_lib.jpg_dims(buf, len(data), ctypes.byref(h), ctypes.byref(w)) != 0:
        return None
    return h.value, w.value


def decode_jpeg(data: bytes, scale8: int = 8) -> Optional[np.ndarray]:
    """Decode JPEG bytes to an RGB8 (H, W, 3) array via libjpeg.

    scale8 in [1, 8] decodes at scale8/8 resolution in the DCT domain
    (dimensions rounded up). Returns None when the native library is missing
    or the data can't be decoded natively (e.g. CMYK JPEGs — callers fall
    back to PIL)."""
    if _jpg_lib is None:
        return None
    dims = jpeg_dims(data)
    if dims is None:
        return None
    fh, fw = dims
    oh = (fh * scale8 + 7) // 8
    ow = (fw * scale8 + 7) // 8
    out = np.empty((oh, ow, 3), np.uint8)
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = _jpg_lib.jpg_decode(
        buf, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.nbytes,
        ctypes.byref(h), ctypes.byref(w), scale8,
    )
    if rc != 0:
        return None
    if (h.value, w.value) != (oh, ow):  # libjpeg rounding differed: re-wrap
        out = out.reshape(-1)[: h.value * w.value * 3].reshape(h.value, w.value, 3)
    return out


class NativeWordPieceTokenizer:
    """C++ WordPiece with per-call Python fallback for non-ASCII text."""

    def __init__(self, vocab_path: str):
        if _tok_lib is None:
            raise RuntimeError("libclimb_tokenizer.so not built")
        self._h = _tok_lib.wp_create(vocab_path.encode())
        if not self._h:
            raise RuntimeError(f"failed to load vocab {vocab_path}")
        from climb_tpu.data.tokenization import WordPieceTokenizer

        self._py = WordPieceTokenizer.from_vocab_file(vocab_path)
        self.pad_id = _tok_lib.wp_pad_id(self._h)
        self.sep_id = _tok_lib.wp_sep_id(self._h)
        self.cls_id = _tok_lib.wp_cls_id(self._h)

    def __del__(self):
        h = getattr(self, "_h", None)
        if h and _tok_lib is not None:
            _tok_lib.wp_destroy(h)
            self._h = None

    def encode(self, text: str, max_len: int, text_pair: Optional[str] = None):
        ids = np.empty((max_len,), np.int32)
        mask = np.empty((max_len,), np.float32)
        types = np.empty((max_len,), np.int32)
        rc = _tok_lib.wp_encode(
            self._h,
            text.encode(),
            text_pair.encode() if text_pair else None,
            max_len,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            types.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:  # non-ASCII text: python unicode path
            return self._py.encode(text, max_len, text_pair)
        return ids, mask, types

    def batch_encode(self, texts, max_len, pairs=None):
        outs = [
            self.encode(t, max_len, None if pairs is None else pairs[i])
            for i, t in enumerate(texts)
        ]
        ids, mask, types = zip(*outs)
        return np.stack(ids), np.stack(mask), np.stack(types)


def resize_into_canvas(src: np.ndarray, out_hw, canvas_hw, filter: str = "bicubic") -> Optional[np.ndarray]:
    """C++ resize of an HxWx3 uint8 array into a zeroed canvas; None if the
    native library is unavailable."""
    if _img_lib is None:
        return None
    src = np.ascontiguousarray(src, dtype=np.uint8)
    h_in, w_in = src.shape[:2]
    h_out, w_out = out_hw
    ch, cw = canvas_hw
    dst = np.zeros((ch, cw, 3), np.uint8)
    rc = _img_lib.img_resize_into_canvas(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h_in, w_in,
        h_out, w_out,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ch, cw,
        1 if filter == "bicubic" else 0,
    )
    return dst if rc == 0 else None
