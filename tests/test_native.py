"""Native C++ components vs their Python/PIL references.

Builds the .so files on first run (skipped cleanly when g++ is unavailable).
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def native():
    from climb_tpu.native import build as native_build

    if not native_build.build(verbose=False):
        pytest.skip("native toolchain unavailable")
    import importlib

    import climb_tpu.native as native_mod

    importlib.reload(native_mod)
    if not all(native_mod.native_available().values()):
        pytest.skip("native libraries failed to load")
    return native_mod


VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a the cat dog is on mat play ##ing run "
    "##s what color says hello , . ! ?".split()
)


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("nat") / "vocab.txt"
    p.write_text("\n".join(VOCAB))
    return str(p)


def test_native_tokenizer_matches_python(native, vocab_file):
    from climb_tpu.data.tokenization import WordPieceTokenizer

    nat = native.NativeWordPieceTokenizer(vocab_file)
    py = WordPieceTokenizer.from_vocab_file(vocab_file)
    texts = [
        "The cat is playing on the mat!",
        "what [SEP] runs",
        "says hello, dog runs.",
        "café dog",  # non-ASCII -> python fallback path
        "unknownstuff cat",
        "",
    ]
    for t in texts:
        a = nat.encode(t, 16)
        b = py.encode(t, 16)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y, err_msg=repr(t))
    # pair encoding with truncation
    a = nat.encode("the cat is on the mat", 10, "dog runs playing")
    b = py.encode("the cat is on the mat", 10, "dog runs playing")
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_native_resize_matches_pil(native, rng):
    from PIL import Image

    src = rng.randint(0, 255, (200, 300, 3)).astype(np.uint8)
    for filt, pil_filt in (("bicubic", Image.BICUBIC), ("bilinear", Image.BILINEAR)):
        ref = np.asarray(Image.fromarray(src).resize((96, 64), pil_filt))
        out = native.resize_into_canvas(src, (64, 96), (64, 96), filt)
        diff = np.abs(ref.astype(int) - out.astype(int))
        assert diff.max() <= 2, f"{filt}: max diff {diff.max()}"


def test_native_resize_canvas_padding(native, rng):
    src = rng.randint(0, 255, (100, 100, 3)).astype(np.uint8)
    out = native.resize_into_canvas(src, (64, 64), (64, 96))
    assert out.shape == (64, 96, 3)
    assert out[:, 64:].sum() == 0  # right padding zeroed
    assert out[:, :64].sum() > 0


def _smooth_rgb(rng, h, w):
    arr = np.cumsum(np.cumsum(rng.randn(h, w, 3), 0), 1)
    return ((arr - arr.min()) / (arr.max() - arr.min() + 1e-9) * 255).astype(np.uint8)


def test_native_jpeg_decode_matches_pil(native, rng):
    """Full-resolution libjpeg decode is bit-exact with PIL for RGB and
    grayscale baseline JPEGs (both use the islow IDCT)."""
    import io

    from PIL import Image

    for h, w in ((300, 450), (97, 131)):
        arr = _smooth_rgb(rng, h, w)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=90)
        data = buf.getvalue()
        assert native.jpeg_dims(data) == (h, w)
        mine = native.decode_jpeg(data)
        ref = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(mine, ref)

    gray = io.BytesIO()
    Image.fromarray(_smooth_rgb(rng, 120, 80)[:, :, 0]).save(gray, "JPEG")
    mine = native.decode_jpeg(gray.getvalue())
    ref = np.asarray(Image.open(io.BytesIO(gray.getvalue())).convert("RGB"))
    np.testing.assert_array_equal(mine, ref)


def test_native_jpeg_dct_prescale_dims(native, rng):
    """scale8/8 DCT-domain decode produces ceil(dim*scale8/8) output."""
    import io

    from PIL import Image

    arr = _smooth_rgb(rng, 301, 453)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG")
    for s in (1, 2, 4, 5, 8):
        out = native.decode_jpeg(buf.getvalue(), scale8=s)
        assert out.shape == ((301 * s + 7) // 8, (453 * s + 7) // 8, 3), s


def test_native_jpeg_invalid_input(native):
    assert native.jpeg_dims(b"not a jpeg") is None
    assert native.decode_jpeg(b"\xff\xd8\xff\xe0garbage") is None


def test_process_jpeg_file_matches_pil_path(native, rng, tmp_path):
    """The fully-native JPEG->canvas path equals the PIL decode + process_image
    path bit for bit (decode exact + resample bit-exact)."""
    from PIL import Image

    from climb_tpu.data.image_pipeline import process_image, process_jpeg_file

    for i, (h, w) in enumerate(((480, 720), (333, 217), (64, 64))):
        arr = _smooth_rgb(rng, h, w)
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(arr).save(p, "JPEG", quality=92)
        native_out = process_jpeg_file(str(p))
        assert native_out is not None
        with Image.open(p) as img:
            pil_out = process_image(img)
        assert native_out[1] == pil_out[1]  # patch_hw
        diff = np.abs(native_out[0].astype(int) - pil_out[0].astype(int))
        assert diff.max() <= 2, f"{(h, w)}: canvas max diff {diff.max()}"


def test_backbone_uses_native_jpeg_path(native, rng, tmp_path):
    from PIL import Image

    from climb_tpu.data.image_backbones import CanvasImageProvider

    arr = _smooth_rgb(rng, 200, 320)
    p = tmp_path / "x.jpg"
    Image.fromarray(arr).save(p, "JPEG")
    prov = CanvasImageProvider()
    canvas, patch_hw = prov.load_canvas(str(p))
    assert canvas.shape == (384, 640, 3)
    assert patch_hw == (12, 18) or patch_hw[0] <= 12  # resized to canvas
