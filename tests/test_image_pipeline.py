"""Image pipeline parity vs HF ViltImageProcessor resize semantics."""

import numpy as np
import pytest

from climb_tpu.data.image_pipeline import process_image, vilt_resize_dims


def test_resize_dims_match_hf():
    transformers = pytest.importorskip("transformers")
    from transformers.models.vilt.image_processing_vilt import (
        get_resize_output_image_size,
    )

    rng = np.random.RandomState(0)
    for _ in range(50):
        h = int(rng.randint(40, 1200))
        w = int(rng.randint(40, 1200))
        img = np.zeros((h, w, 3), np.uint8)
        ref_h, ref_w = get_resize_output_image_size(img, shorter=384, longer=640, size_divisor=32)
        my_h, my_w = vilt_resize_dims(h, w, max_h=10_000, max_w=10_000)  # no canvas cap
        assert (my_h, my_w) == (ref_h, ref_w), f"{h}x{w}: {my_h}x{my_w} != {ref_h}x{ref_w}"


def test_canvas_cap_portrait():
    # portrait image: HF would produce height up to 640; the fixed landscape
    # canvas caps height at 384 (documented deviation)
    h, w = vilt_resize_dims(800, 600)
    assert h <= 384 and w <= 640
    assert h % 32 == 0 and w % 32 == 0


def test_process_image_shapes(rng):
    from PIL import Image

    img = Image.fromarray(rng.randint(0, 255, (500, 700, 3)).astype(np.uint8))
    canvas, (ph, pw) = process_image(img, (384, 640))
    assert canvas.shape == (384, 640, 3)
    assert canvas.dtype == np.uint8
    # valid region is top-left; outside must be zero
    assert canvas[ph * 32 :, :, :].sum() == 0
    assert canvas[:, pw * 32 :, :].sum() == 0
    assert canvas[: ph * 32, : pw * 32].sum() > 0


def test_process_image_grayscale_and_small(rng):
    from PIL import Image

    gray = Image.fromarray(rng.randint(0, 255, (50, 60)).astype(np.uint8), mode="L")
    canvas, (ph, pw) = process_image(gray, (384, 640))
    assert canvas.shape == (384, 640, 3)
    assert ph >= 1 and pw >= 1
