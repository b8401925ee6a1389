"""`visual_input_type='raw'` parity (reference cocoimages_dataset.py:47-51).

'raw' emits host-normalized float32 canvases (Resize+ToTensor+Normalize at
load); 'pil-image' emits uint8 canvases normalized on-device. Both must
produce bit-identical model inputs in f32.
"""

import numpy as np
import pytest

from climb_tpu.data.image_backbones import CanvasImageProvider
from climb_tpu.data.image_pipeline import normalize_canvas_host


@pytest.fixture
def jpg(tmp_path, rng):
    from PIL import Image

    p = str(tmp_path / "img.jpg")
    Image.fromarray(rng.randint(0, 255, (300, 420, 3)).astype(np.uint8)).save(p)
    return p


def test_raw_matches_device_normalize(jpg):
    import jax.numpy as jnp

    from climb_tpu.ops.image_ops import normalize_images

    u8, hw_u8 = CanvasImageProvider((128, 160), 32).load_canvas(jpg)
    raw, hw_raw = CanvasImageProvider((128, 160), 32, visual_input_type="raw").load_canvas(jpg)
    assert hw_u8 == hw_raw
    assert u8.dtype == np.uint8 and raw.dtype == np.float32
    assert raw.min() >= -1.0 and raw.max() <= 1.0
    device = np.asarray(normalize_images(jnp.asarray(u8)[None])[0])
    np.testing.assert_array_equal(raw, device)  # bit-identical in f32


def test_prepare_batch_passes_raw_through(jpg):
    from climb_tpu.train.train_step import prepare_batch

    raw, _ = CanvasImageProvider((128, 160), 32, visual_input_type="raw").load_canvas(jpg)
    batch = {"pixel_values": np.stack([raw, raw])}
    out = prepare_batch(batch)
    np.testing.assert_array_equal(np.asarray(out["pixel_values"]), batch["pixel_values"])


def test_broken_image_raw_fallback(tmp_path):
    p = str(tmp_path / "broken.jpg")
    with open(p, "wb") as f:
        f.write(b"not a jpeg")
    canvas, _ = CanvasImageProvider((64, 96), 32, visual_input_type="raw").load_canvas(p)
    assert canvas.dtype == np.float32
    np.testing.assert_array_equal(canvas, np.full((64, 96, 3), -1.0, np.float32))


def test_fast_rcnn_raises_like_reference():
    with pytest.raises(NotImplementedError):
        CanvasImageProvider(visual_input_type="fast-rcnn")


def test_normalize_canvas_host_formula(rng):
    u8 = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    out = normalize_canvas_host(u8)
    np.testing.assert_allclose(out, u8.astype(np.float32) / 255.0 * 2.0 - 1.0, atol=1e-6)
