"""Real-format parsing tests for Phase II vision and language datasets
(fabricated mini data mirroring each task's on-disk layout)."""

import csv
import json
import os

import numpy as np
import pytest

from climb_tpu.data.tokenization import HashTokenizer

TOK = HashTokenizer()
CANVAS = (64, 96)


def _img(path, size=(80, 100)):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", size, (10, 200, 30)).save(path)


# --------------------------- vision ----------------------------------------

@pytest.fixture(scope="module")
def imagenet_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imagenet")
    classes = ["n01", "n02", "n03"]
    for ci, c in enumerate(classes):
        for j in range(5):
            _img(str(root / "train" / c / f"{c}_{j}.JPEG"))
    for j in range(4):
        _img(str(root / "val" / f"ILSVRC2012_val_{j:08d}.JPEG"))
    with open(root / "LOC_val_solution.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["ImageId", "PredictionString"])
        w.writeheader()
        for j in range(4):
            w.writerow({
                "ImageId": f"ILSVRC2012_val_{j:08d}",
                "PredictionString": f"{classes[j % 3]} 0 0 10 10",
            })
    return str(root)


def test_imagenet_splits(imagenet_dir):
    from climb_tpu.data.vision import ImageNetDataset

    train = ImageNetDataset(imagenet_dir, "train", n_shot=2, subsample_seed=10,
                            tokenizer=TOK, canvas_hw=CANVAS)
    # 5/class, 50 val/class requested but only 5 exist -> n_train = 0 per class
    # with val_num_per_class=50... classes have 5 images: n_train = 5-50 < 0
    # reference behavior keeps negative slice empty; with tiny data expect
    # val to absorb everything
    test = ImageNetDataset(imagenet_dir, "test", tokenizer=TOK, canvas_hw=CANVAS)
    assert len(test) == 4
    ex = test[0]
    assert ex["pixel_values"].shape == (64, 96, 3)
    assert ex["input_ids"].shape == (40,)
    assert 0 <= int(ex["labels"]) < 3


@pytest.fixture(scope="module")
def coco_cls_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_cls")
    anns = {"annotations": [], "images": []}
    for i in range(10):
        _img(str(root / "images" / f"{i:012d}.jpg"))
        anns["annotations"].append({"image_id": i, "category_id": 1 + (i % 3) * 7})
        if i % 2 == 0:
            anns["annotations"].append({"image_id": i, "category_id": 8})
    os.makedirs(root / "detections" / "annotations", exist_ok=True)
    for split in ("train", "val"):
        with open(root / "detections" / "annotations" / f"instances_{split}2017.json", "w") as f:
            json.dump(anns, f)
    return str(root)


def test_coco_cls_multihot(coco_cls_dir):
    from climb_tpu.data.vision import CocoClsDataset

    test = CocoClsDataset(coco_cls_dir, "test", tokenizer=TOK, canvas_hw=CANVAS)
    assert len(test) == 10
    ex = test[0]
    assert ex["labels"].shape == (80,)
    assert ex["labels"].sum() >= 1
    train = CocoClsDataset(coco_cls_dir, "train", n_shot=0.5, subsample_seed=10,
                           tokenizer=TOK, canvas_hw=CANVAS)
    assert len(train) == 5  # 50% of 10


@pytest.fixture(scope="module")
def inat_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("inat")
    for split in ("train", "val"):
        images, annotations = [], []
        for i in range(8):
            fn = f"images/{split}_{i}.jpg"
            _img(str(root / fn))
            images.append({"file_name": fn})
            annotations.append({"category_id": i % 2})
        with open(root / f"{split}2019.json", "w") as f:
            json.dump({"images": images, "annotations": annotations}, f)
    return str(root)


def test_inat_small_classes_kept(inat_dir):
    from climb_tpu.data.vision import Inat2019Dataset

    train = Inat2019Dataset(inat_dir, "train", n_shot=16, subsample_seed=10,
                            tokenizer=TOK, canvas_hw=CANVAS)
    # classes have 4 examples <= n_shot -> kept whole (reference :60-64)
    assert len(train) == 8
    test = Inat2019Dataset(inat_dir, "test", tokenizer=TOK, canvas_hw=CANVAS)
    assert len(test) == 8


# --------------------------- language ---------------------------------------

@pytest.fixture(scope="module")
def lang_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("lang")
    # piqa
    os.makedirs(root / "piqa", exist_ok=True)
    n = 20
    (root / "piqa" / "train.jsonl").write_text("\n".join(
        json.dumps({"goal": f"goal {i}", "sol1": "do a", "sol2": "do b"}) for i in range(n)
    ))
    (root / "piqa" / "train-labels.lst").write_text("\n".join(str(i % 2) for i in range(n)))
    (root / "piqa" / "valid.jsonl").write_text("\n".join(
        json.dumps({"goal": f"vgoal {i}", "sol1": "x", "sol2": "y"}) for i in range(6)
    ))
    (root / "piqa" / "valid-labels.lst").write_text("\n".join(str(i % 2) for i in range(6)))
    # hellaswag
    os.makedirs(root / "hellaswag", exist_ok=True)
    (root / "hellaswag" / "hellaswag_train.jsonl").write_text("\n".join(
        json.dumps({"ctx": f"ctx {i}", "endings": ["a", "b", "c", "d"], "label": i % 4})
        for i in range(n)
    ))
    (root / "hellaswag" / "hellaswag_val.jsonl").write_text("\n".join(
        json.dumps({"ctx": f"v {i}", "endings": ["a", "b", "c", "d"], "label": i % 4})
        for i in range(4)
    ))
    # commonsenseqa
    os.makedirs(root / "commonsenseqa", exist_ok=True)
    keys = ["A", "B", "C", "D", "E"]
    (root / "commonsenseqa" / "train_rand_split.jsonl").write_text("\n".join(
        json.dumps({
            "question": {"stem": f"q {i}", "choices": [{"text": f"c{j}"} for j in range(5)]},
            "answerKey": keys[i % 5],
        }) for i in range(n)
    ))
    (root / "commonsenseqa" / "dev_rand_split.jsonl").write_text("\n".join(
        json.dumps({
            "question": {"stem": f"dq {i}", "choices": [{"text": f"c{j}"} for j in range(5)]},
            "answerKey": keys[i % 5],
        }) for i in range(5)
    ))
    # sst2 local fallback
    os.makedirs(root / "sst2", exist_ok=True)
    (root / "sst2" / "sst2_train.jsonl").write_text("\n".join(
        json.dumps({"sentence": f"movie {i}", "label": i % 2}) for i in range(30)
    ))
    (root / "sst2" / "sst2_validation.jsonl").write_text("\n".join(
        json.dumps({"sentence": f"val movie {i}", "label": i % 2}) for i in range(6)
    ))
    return str(root)


def test_piqa_dataset(lang_dir):
    from climb_tpu.data.language import build_language_dataset

    train = build_language_dataset("piqa", os.path.join(lang_dir, "piqa"), "train",
                                   max_len=24, n_shot=6, seed=10, tokenizer=TOK)
    assert len(train) == 6
    ex = train[0]
    assert ex["input_ids"].shape == (2, 24)  # 2 choices, pair-encoded
    assert ex["token_type_ids"].max() == 1   # text_b segment present
    test = build_language_dataset("piqa", os.path.join(lang_dir, "piqa"), "test",
                                  max_len=24, tokenizer=TOK)
    assert len(test) == 6


def test_hellaswag_and_csqa(lang_dir):
    from climb_tpu.data.language import build_language_dataset

    hs = build_language_dataset("hellaswag", os.path.join(lang_dir, "hellaswag"),
                                "train", 32, n_shot=5, seed=10, tokenizer=TOK)
    assert len(hs) == 5 and hs[0]["input_ids"].shape == (4, 32)
    cs = build_language_dataset("commonsenseqa", os.path.join(lang_dir, "commonsenseqa"),
                                "test", 32, tokenizer=TOK)
    assert len(cs) == 5 and cs[0]["input_ids"].shape == (5, 32)


def test_sst2_local_fallback_class_balance(lang_dir):
    from climb_tpu.data.language import build_language_dataset

    train = build_language_dataset("sst2", os.path.join(lang_dir, "sst2"), "train",
                                   max_len=16, n_shot=4, seed=10, tokenizer=TOK)
    # class-balanced n-shot: 4 per class (reference text_dataset.py:38-46)
    labels = [int(train[i]["labels"]) for i in range(len(train))]
    assert len(train) == 8
    assert sum(labels) == 4
    # dev split is 30% of train (seed 2022) and test is the original dev set
    dev = build_language_dataset("sst2", os.path.join(lang_dir, "sst2"), "val",
                                 max_len=16, tokenizer=TOK)
    assert len(dev) == 9  # 30% of 30
    test = build_language_dataset("sst2", os.path.join(lang_dir, "sst2"), "test",
                                  max_len=16, tokenizer=TOK)
    assert len(test) == 6


def test_places365(tmp_path):
    from climb_tpu.data.vision import Places365Dataset

    for split in ("train", "val"):
        for c in ("alley", "beach"):
            for j in range(4):
                _img(str(tmp_path / split / c / f"{j}.jpg"), size=(64, 64))
    test = Places365Dataset(str(tmp_path), "test", tokenizer=TOK, canvas_hw=CANVAS)
    assert len(test) == 8
    ex = test[0]
    assert ex["pixel_values"].shape == (64, 96, 3)
    assert int(ex["labels"]) in (0, 1)
