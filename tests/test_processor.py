"""ViltInputProcessor (raw inputs -> batch) + pallas normalize numerics."""

import numpy as np
import pytest

import jax.numpy as jnp

from climb_tpu.data.tokenization import HashTokenizer


@pytest.fixture
def processor():
    from climb_tpu.data.processor import ViltInputProcessor

    return ViltInputProcessor(HashTokenizer(), max_text_len=16, canvas_hw=(64, 96))


def _img(rng, h=70, w=90):
    from PIL import Image

    return Image.fromarray(rng.randint(0, 255, (h, w, 3)).astype(np.uint8))


def test_single_image_batch(processor, rng):
    batch = processor(["a cat", "a dog runs"], [_img(rng), _img(rng, 50, 120)])
    assert batch["input_ids"].shape == (2, 16)
    assert batch["pixel_values"].shape == (2, 64, 96, 3)
    assert batch["patch_hw"].shape == (2, 2)
    assert batch["pixel_values"].dtype == np.uint8


def test_image_pair_batch(processor, rng):
    batch = processor(["two images"], [[_img(rng), _img(rng)]])
    assert batch["pixel_values"].shape == (1, 2, 64, 96, 3)
    assert batch["patch_hw"].shape == (1, 2, 2)


def test_multi_choice_batch(processor, rng):
    batch = processor.multi_choice([["a", "b", "c", "d"]], [_img(rng)])
    assert batch["input_ids"].shape == (1, 4, 16)
    assert batch["pixel_values"].shape == (1, 64, 96, 3)


def test_converter_registry(processor, rng):
    from climb_tpu.data.processor import get_batch_converter

    conv = get_batch_converter("vilt_seq")
    out = conv(processor, [("hello", "world"), np.array([0, 1])], _img(rng))
    assert out["pixel_values"].shape[0] == 1  # mean image broadcastable
    assert out["input_ids"].shape == (2, 16)

    conv = get_batch_converter("vilt_mc")
    out = conv(processor, [("q1",), (["a", "b"],), np.array([0])], _img(rng))
    assert out["input_ids"].shape == (1, 2, 16)


def test_pallas_normalize_matches_reference(rng):
    from climb_tpu.ops.image_ops import normalize_images
    from climb_tpu.ops.pallas_image import normalize_pallas

    x = jnp.asarray(rng.randint(0, 255, (2, 8, 128, 3)).astype(np.uint8))
    ref = normalize_images(x)
    out = normalize_pallas(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
