"""Real-format dataset parsing on fabricated mini-data + tokenizer parity.

Builds a miniature CLiMB data directory (real annotation formats, tiny
generated images) and runs each VL dataset through loading, fixed-shape
emission, and collation — the hermetic stand-in for the multi-GB downloads
(SURVEY.md section 4 strategy #3).
"""

import json
import os
import pickle

import numpy as np
import pytest

from climb_tpu.data.collation import stack_collate
from climb_tpu.data.loader import DataLoader
from climb_tpu.data.tokenization import WordPieceTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a the cat dog is on mat red blue two "
    "person play ##ing run ##s what color be yes no girl boy say hello "
    "gray casey riley , . ? ! and of to in it".split()
)


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text("\n".join(VOCAB))
    return str(p)


@pytest.fixture(scope="module")
def tokenizer(vocab_file):
    return WordPieceTokenizer.from_vocab_file(vocab_file)


def test_wordpiece_matches_hf(vocab_file):
    transformers = pytest.importorskip("transformers")
    hf = transformers.BertTokenizerFast(vocab_file=vocab_file, do_lower_case=True)
    mine = WordPieceTokenizer.from_vocab_file(vocab_file)
    texts = [
        "The cat is playing on the mat.",
        "What color is the dog?",
        "a girl says hello, runs!",
        "unknownword on mat",
        "two persons playing",
    ]
    for t in texts:
        ids_hf = hf(t, max_length=16, padding="max_length", truncation=True)["input_ids"]
        ids_me, mask, _ = mine.encode(t, 16)
        assert list(ids_me) == list(ids_hf), f"mismatch on {t!r}"
    # pair encoding (token_type_ids)
    enc = hf("the cat", "the dog", max_length=12, padding="max_length",
             truncation=True, return_token_type_ids=True)
    ids_me, mask_me, types_me = mine.encode("the cat", 12, text_pair="the dog")
    assert list(ids_me) == list(enc["input_ids"])
    assert list(types_me) == list(enc["token_type_ids"])


def _write_img(path, size=(100, 80), color=(120, 30, 200)):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", size, color).save(path)


@pytest.fixture(scope="module")
def climb_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("climb_data")

    # --- ms-coco images (VQA) ---
    for i in range(1, 4):
        _write_img(str(root / "ms-coco" / "images" / f"COCO_train2014_{i:012d}.jpg"))
    # --- vqav2 ---
    vqa = root / "vqav2"
    os.makedirs(vqa, exist_ok=True)
    questions = [
        {"question_id": 10 * i, "image_id": i, "question": "what color is the cat?"}
        for i in range(1, 4)
    ]
    annotations = [
        {
            "question_id": 10 * i,
            "image_id": i,
            "multiple_choice_answer": "red",
            "answers": [{"answer": "red"}] * 7 + [{"answer": "blue"}] * 3,
        }
        for i in range(1, 4)
    ]
    for split in ("train", "val"):
        (vqa / f"v2_OpenEnded_mscoco_{split}2014_questions.json").write_text(
            json.dumps({"questions": questions})
        )
        (vqa / f"v2_mscoco_{split}2014_annotations.json").write_text(
            json.dumps({"annotations": annotations})
        )
    with open(vqa / "ans2label.pkl", "wb") as f:
        pickle.dump({"red": 0, "blue": 1, "2": 2}, f)

    # --- nlvr2 ---
    nlvr = root / "nlvr2"
    os.makedirs(nlvr / "data", exist_ok=True)
    lines = []
    for i in range(4):
        ident = f"train-{i}-0-{i}"
        stem = f"train-{i}-0"
        _write_img(str(nlvr / "images" / "train" / f"{stem}-img0.png"))
        _write_img(str(nlvr / "images" / "train" / f"{stem}-img1.png"))
        lines.append(json.dumps({
            "identifier": ident,
            "sentence": "two dogs play on the mat",
            "label": "True" if i % 2 else "False",
        }))
    (nlvr / "data" / "train.json").write_text("\n".join(lines))

    # --- snli-ve + flickr30k ---
    for i in range(1, 4):
        _write_img(str(root / "flickr30k" / "flickr30k_images" / f"{i}.jpg"))
    sv = root / "snli-ve"
    os.makedirs(sv, exist_ok=True)
    cats = ["entailment", "contradiction", "neutral"]
    sv_lines = [
        json.dumps({
            "Flickr30K_ID": str(1 + (i % 3)),
            "sentence2": "the cat is on the mat",
            "gold_label": cats[i % 3],
        })
        for i in range(6)
    ]
    (sv / "snli_ve_train.jsonl").write_text("\n".join(sv_lines))

    # --- vcr ---
    vcr = root / "vcr"
    os.makedirs(vcr / "annotation", exist_ok=True)
    vcr_lines = []
    for i in range(3):
        annot_id = f"train-{i}"
        _write_img(str(vcr / "drawn_images" / "bbox" / "train" / "qa" / f"{annot_id}.jpg"))
        vcr_lines.append(json.dumps({
            "annot_id": annot_id,
            "objects": ["person", "dog"],
            "question": ["what", "is", [0], "playing", "?"],
            "answer_choices": [
                [[0], "plays", "on", "the", "mat"],
                ["the", "dog", "runs"],
                [[1], "is", "red"],
                ["no"],
            ],
            "answer_label": i % 4,
            "rationale_choices": [["it", "is"], ["says"], ["hello"], ["blue"]],
            "rationale_label": 0,
        }))
    (vcr / "annotation" / "train.jsonl").write_text("\n".join(vcr_lines))
    return str(root)


CANVAS = (64, 96)


def test_vqa_dataset(climb_dir, tokenizer):
    from climb_tpu.data.image_backbones import MSCOCOImagesDataset
    from climb_tpu.data.visionlanguage import VQADataset

    images = MSCOCOImagesDataset(os.path.join(climb_dir, "ms-coco"), CANVAS)
    ds = VQADataset(os.path.join(climb_dir, "vqav2"), images, "train", tokenizer, 40, CANVAS)
    assert len(ds) == 3
    ex = ds[0]
    assert ex["pixel_values"].shape == (64, 96, 3)
    assert ex["input_ids"].shape == (40,)
    assert ex["target_scores"].shape == (3,)
    # 7x 'red' -> 1.0, 3x 'blue' -> 0.9
    assert ex["target_scores"][0] == 1.0
    assert ex["target_scores"][1] == pytest.approx(0.9)
    # image 100x80 -> resized into canvas: valid patches >= 1
    assert 1 <= ex["patch_hw"][0] <= 2 and 1 <= ex["patch_hw"][1] <= 3


def test_nlvr2_dataset(climb_dir, tokenizer):
    from climb_tpu.data.visionlanguage import NLVR2Dataset

    ds = NLVR2Dataset(os.path.join(climb_dir, "nlvr2"), "train", tokenizer, 40, CANVAS)
    assert len(ds) == 4
    ex = ds[1]
    assert ex["pixel_values"].shape == (2, 64, 96, 3)
    assert ex["patch_hw"].shape == (2, 2)
    assert ex["labels"] == 1
    assert ds[0]["labels"] == 0
    batch = stack_collate([ds[i] for i in range(4)])
    assert batch["pixel_values"].shape == (4, 2, 64, 96, 3)


def test_snli_ve_dataset(climb_dir, tokenizer):
    from climb_tpu.data.image_backbones import Flickr30KImagesDataset
    from climb_tpu.data.visionlanguage import SnliVEDataset

    images = Flickr30KImagesDataset(os.path.join(climb_dir, "flickr30k"), CANVAS)
    ds = SnliVEDataset(os.path.join(climb_dir, "snli-ve"), images, "train", tokenizer, 40, CANVAS)
    assert len(ds) == 6
    labels = sorted(ds[i]["labels"] for i in range(6))
    assert labels == [0, 0, 1, 1, 2, 2]
    ds.convert_to_low_shot(num_shots_per_class=1)
    assert len(ds) == 3


def test_vcr_dataset(climb_dir, tokenizer):
    from climb_tpu.data.visionlanguage import VCRDataset

    ds = VCRDataset(os.path.join(climb_dir, "vcr"), "train", "qa", tokenizer, 40, CANVAS)
    assert len(ds) == 3
    ex = ds[0]
    assert ex["input_ids"].shape == (4, 40)
    assert ex["pixel_values"].shape == (64, 96, 3)
    # detokenization: object [0] is a person -> gender-neutral name
    assert "Casey" in ds.data[0]["texts"][0]
    # the [SEP] between question and answer must map to the special token id
    sep_id = tokenizer.sep_id
    ids = ex["input_ids"][0]
    assert np.sum(ids == sep_id) >= 2  # mid-text [SEP] + final [SEP]


def test_dataloader_over_real_format(climb_dir, tokenizer):
    from climb_tpu.data.image_backbones import Flickr30KImagesDataset
    from climb_tpu.data.visionlanguage import SnliVEDataset

    images = Flickr30KImagesDataset(os.path.join(climb_dir, "flickr30k"), CANVAS)
    ds = SnliVEDataset(os.path.join(climb_dir, "snli-ve"), images, "train", tokenizer, 40, CANVAS)
    dl = DataLoader(ds, batch_size=4, collate_fn=stack_collate, shuffle=True)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["pixel_values"].shape == (4, 64, 96, 3)
    # padded final batch carries the valid mask
    assert batches[1]["valid"].sum() == 2


def test_canvas_widths_match_loaded_patch_widths(climb_dir, tokenizer):
    """Aspect-bucketing hint parity: the header-only width prediction must
    equal the width the pipeline actually loads (patch_hw[...,1] * patch) —
    a wrong prediction would silently demote batches to the safety path."""
    from climb_tpu.data.image_backbones import (
        Flickr30KImagesDataset,
        MSCOCOImagesDataset,
    )
    from climb_tpu.data.visionlanguage import (
        NLVR2Dataset,
        SnliVEDataset,
        VCRDataset,
        VQADataset,
    )

    coco = MSCOCOImagesDataset(os.path.join(climb_dir, "ms-coco"), CANVAS)
    flickr = Flickr30KImagesDataset(os.path.join(climb_dir, "flickr30k"), CANVAS)
    datasets = [
        VQADataset(os.path.join(climb_dir, "vqav2"), coco, "train", tokenizer, 40, CANVAS),
        NLVR2Dataset(os.path.join(climb_dir, "nlvr2"), "train", tokenizer, 40, CANVAS),
        SnliVEDataset(os.path.join(climb_dir, "snli-ve"), flickr, "train", tokenizer, 40, CANVAS),
        VCRDataset(os.path.join(climb_dir, "vcr"), "train", "qa", tokenizer, 40, CANVAS),
    ]
    for ds in datasets:
        widths = ds.canvas_widths()
        assert len(widths) == len(ds)
        for i in range(len(ds)):
            actual = int(np.max(np.asarray(ds[i]["patch_hw"])[..., 1])) * 32
            assert widths[i] == actual, (type(ds).__name__, i, widths[i], actual)
        # the header-dims memo is persisted next to the annotation caches
        assert os.path.exists(ds._dims_cache_path)


def test_text_lengths_match_real_token_counts(climb_dir, tokenizer):
    """Text-bucketing hint parity: text_lengths() must equal the real token
    count the pipeline emits (text_mask sums) — exact because it runs the
    same tokenizer; the text->len memo is persisted next to the caches."""
    from climb_tpu.data.image_backbones import (
        Flickr30KImagesDataset,
        MSCOCOImagesDataset,
    )
    from climb_tpu.data.visionlanguage import (
        NLVR2Dataset,
        SnliVEDataset,
        VCRDataset,
        VQADataset,
    )

    coco = MSCOCOImagesDataset(os.path.join(climb_dir, "ms-coco"), CANVAS)
    flickr = Flickr30KImagesDataset(os.path.join(climb_dir, "flickr30k"), CANVAS)
    datasets = [
        VQADataset(os.path.join(climb_dir, "vqav2"), coco, "train", tokenizer, 40, CANVAS),
        NLVR2Dataset(os.path.join(climb_dir, "nlvr2"), "train", tokenizer, 40, CANVAS),
        SnliVEDataset(os.path.join(climb_dir, "snli-ve"), flickr, "train", tokenizer, 40, CANVAS),
        VCRDataset(os.path.join(climb_dir, "vcr"), "train", "qa", tokenizer, 40, CANVAS),
    ]
    for ds in datasets:
        lens = ds.text_lengths()
        assert len(lens) == len(ds)
        for i in range(len(ds)):
            mask = np.asarray(ds[i]["text_mask"])
            actual = int(mask.sum(axis=-1).max())
            assert lens[i] == actual, (type(ds).__name__, i, lens[i], actual)
        assert os.path.exists(ds._tlen_cache_path)
