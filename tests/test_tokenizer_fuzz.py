"""Fuzz parity: WordPiece (Python + C++ native) vs HF BertTokenizerFast over
randomized ASCII text, casing, punctuation, and pair encoding."""

import random
import string

import numpy as np
import pytest

from climb_tpu.data.tokenization import WordPieceTokenizer

VOCAB_WORDS = [
    "the", "cat", "dog", "run", "##s", "##ning", "play", "##ing", "##ed",
    "jump", "big", "small", "house", "car", "##t", "##e", "##r", "a", "b",
    "c", "un", "##believ", "##able", "on", "in", "at", "!", "?", ".", ",",
    "'", '"', "-", "(", ")", "[", "]", "0", "1", "2", "##0", "##1",
] + list(string.ascii_lowercase) + ["##" + c for c in string.ascii_lowercase]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("fuzz") / "vocab.txt"
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + sorted(set(VOCAB_WORDS))
    p.write_text("\n".join(vocab))
    return str(p)


def random_text(rng, max_words=12):
    pieces = []
    for _ in range(rng.randint(1, max_words)):
        choice = rng.random()
        if choice < 0.5:
            w = rng.choice(["the", "cat", "dogs", "running", "unbelievable",
                            "play", "played", "jumbo", "bigt", "carter"])
        elif choice < 0.7:
            w = "".join(rng.choice(string.ascii_letters) for _ in range(rng.randint(1, 8)))
        elif choice < 0.85:
            w = rng.choice(["don't", "cat!", "(dog)", "a-b", "1,2", "[SEP]", "c.d"])
        else:
            w = "".join(rng.choice(string.punctuation) for _ in range(rng.randint(1, 3)))
        pieces.append(w)
    return " ".join(pieces)


def test_fuzz_vs_hf(vocab_file):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizerFast(vocab_file=vocab_file, do_lower_case=True)
    mine = WordPieceTokenizer.from_vocab_file(vocab_file)
    rng = random.Random(0)
    for i in range(300):
        t = random_text(rng)
        ref = hf(t, max_length=24, padding="max_length", truncation=True)["input_ids"]
        ids, _, _ = mine.encode(t, 24)
        assert list(ids) == list(ref), f"case {i}: {t!r}\nmine={list(ids)}\nhf  ={list(ref)}"


def test_fuzz_pairs_vs_hf(vocab_file):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizerFast(vocab_file=vocab_file, do_lower_case=True)
    mine = WordPieceTokenizer.from_vocab_file(vocab_file)
    rng = random.Random(1)
    for i in range(150):
        a, b = random_text(rng, 8), random_text(rng, 8)
        if "[SEP]" in a or "[SEP]" in b:
            continue  # HF pair-encoding of embedded specials differs by design
        enc = hf(a, b, max_length=20, padding="max_length", truncation=True,
                 return_token_type_ids=True)
        ids, _, types = mine.encode(a, 20, text_pair=b)
        assert list(ids) == list(enc["input_ids"]), f"case {i}: {a!r} / {b!r}"
        assert list(types) == list(enc["token_type_ids"])


def test_fuzz_native_vs_python(vocab_file):
    try:
        from climb_tpu.native import NativeWordPieceTokenizer, build as _b
    except Exception:
        pytest.skip("native module unavailable")
    from climb_tpu.native import build as native_build

    if not native_build.build(verbose=False):
        pytest.skip("no native toolchain")
    import importlib

    import climb_tpu.native as native_mod

    importlib.reload(native_mod)
    if not native_mod.native_available()["tokenizer"]:
        pytest.skip("tokenizer .so missing")
    nat = native_mod.NativeWordPieceTokenizer(vocab_file)
    py = WordPieceTokenizer.from_vocab_file(vocab_file)
    rng = random.Random(2)
    for i in range(300):
        t = random_text(rng)
        a = nat.encode(t, 24)
        b = py.encode(t, 24)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y, err_msg=f"case {i}: {t!r}")
