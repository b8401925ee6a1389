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
