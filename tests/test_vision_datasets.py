"""Real-format vision-only dataset parsing on fabricated mini-data.

Hermetic stand-in for the multi-GB ImageNet/Places365/iNat2019/COCO
downloads (SURVEY.md section 4 strategy #3): builds miniature directory
trees in the reference's exact on-disk formats and verifies the split /
subsample / label semantics of ``climb_tpu/data/vision/datasets.py``:

- ImageNet (reference imagenet_dataset.py:55-125): dir-per-class train,
  val = 50/class carved from the seed-2022 shuffle tail, test labels from
  LOC_val_solution.csv, n-shot/class subsampling with subsample_seed.
- Places365 (places365_dataset.py): same pattern, .jpg, test = val dir.
- iNat2019 (inat2019_dataset.py:51-85): json annotations; classes with
  <= n_shot examples kept whole; val = min(10%, 50)/class.
- COCO-cls (coco_cls_dataset.py:55-137): instances_*2017.json detections
  -> 80-way multi-hot; 10% val split; percentage subsampling; pickle cache.
"""

import json
import os
import pickle

import numpy as np
import pytest

from climb_tpu.data.tokenization import WordPieceTokenizer
from climb_tpu.data.vision.datasets import (
    CocoClsDataset,
    ImageNetDataset,
    Inat2019Dataset,
    Places365Dataset,
    build_vision_dataset,
)

VOCAB = "[PAD] [UNK] [CLS] [SEP] [MASK] this is an image .".split()
CANVAS = (64, 96)  # small multiples of the 32px patch


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text("\n".join(VOCAB))
    return WordPieceTokenizer.from_vocab_file(str(p))


def _touch(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    open(path, "wb").close()


def _write_jpeg(path, seed=0, size=(40, 30)):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.RandomState(seed)
    Image.fromarray(
        rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8)
    ).save(path, "JPEG")


# --------------------------------------------------------------------------
# ImageNet
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def imagenet_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imagenet")
    for cls in ("n01440764", "n01443537"):
        for i in range(60):
            _touch(str(root / "train" / cls / f"{cls}_{i}.JPEG"))
    # original val split + solution csv (test split)
    lines = ["ImageId,PredictionString"]
    for i, cls in enumerate(["n01443537", "n01440764", "n01443537"]):
        img_id = f"ILSVRC2012_val_{i:08d}"
        _write_jpeg(str(root / "val" / f"{img_id}.JPEG"), seed=i)
        lines.append(f"{img_id},{cls} 0.1 0.2 0.3 0.4")
    (root / "LOC_val_solution.csv").write_text("\n".join(lines) + "\n")
    return str(root)


def test_imagenet_train_val_split(imagenet_dir, tokenizer):
    train = ImageNetDataset(imagenet_dir, "train", tokenizer=tokenizer, canvas_hw=CANVAS)
    val = ImageNetDataset(imagenet_dir, "val", tokenizer=tokenizer, canvas_hw=CANVAS)
    # 60/class: val carves 50/class from the seed-2022 shuffle tail
    assert len(val) == 100 and len(train) == 20
    train_fns = {fn for fn, _ in train.dataset}
    val_fns = {fn for fn, _ in val.dataset}
    assert not train_fns & val_fns
    # deterministic: a fresh construction yields the identical split
    train2 = ImageNetDataset(imagenet_dir, "train", tokenizer=tokenizer, canvas_hw=CANVAS)
    assert train.dataset == train2.dataset
    # labels = index into sorted class-dir names
    labels = {lb for _, lb in train.dataset}
    assert labels == {0, 1}


def test_imagenet_nshot_subsample(imagenet_dir, tokenizer):
    five = ImageNetDataset(imagenet_dir, "train", n_shot=5, subsample_seed=10,
                           tokenizer=tokenizer, canvas_hw=CANVAS)
    assert len(five) == 10  # 5 per class
    per_class = {0: 0, 1: 0}
    for _, lb in five.dataset:
        per_class[lb] += 1
    assert per_class == {0: 5, 1: 5}
    # n-shot picks from the TRAIN side only (never leaks val files)
    val_fns = {fn for fn, _ in ImageNetDataset(
        imagenet_dir, "val", tokenizer=tokenizer, canvas_hw=CANVAS).dataset}
    assert not {fn for fn, _ in five.dataset} & val_fns
    # a different subsample seed draws a different subset (same seed: same)
    again = ImageNetDataset(imagenet_dir, "train", n_shot=5, subsample_seed=10,
                            tokenizer=tokenizer, canvas_hw=CANVAS)
    other = ImageNetDataset(imagenet_dir, "train", n_shot=5, subsample_seed=50,
                            tokenizer=tokenizer, canvas_hw=CANVAS)
    assert five.dataset == again.dataset
    assert five.dataset != other.dataset


def test_imagenet_test_split_reads_solution_csv(imagenet_dir, tokenizer):
    test = ImageNetDataset(imagenet_dir, "test", tokenizer=tokenizer, canvas_hw=CANVAS)
    assert len(test) == 3
    by_name = {os.path.basename(fn): lb for fn, lb in test.dataset}
    # sorted class dirs: n01440764 -> 0, n01443537 -> 1
    assert by_name["ILSVRC2012_val_00000000.JPEG"] == 1
    assert by_name["ILSVRC2012_val_00000001.JPEG"] == 0
    assert by_name["ILSVRC2012_val_00000002.JPEG"] == 1


def test_imagenet_getitem_schema(imagenet_dir, tokenizer):
    test = ImageNetDataset(imagenet_dir, "test", tokenizer=tokenizer, canvas_hw=CANVAS)
    ex = test[0]
    assert ex["pixel_values"].shape == (*CANVAS, 3)
    assert ex["pixel_values"].dtype == np.uint8
    assert ex["labels"].dtype == np.int32
    assert tuple(ex["patch_hw"]) <= (CANVAS[0] // 32, CANVAS[1] // 32)
    # dummy text "This is an image." pre-tokenized once
    ids = list(ex["input_ids"][: int(ex["text_mask"].sum())])
    assert ids == [2, 5, 6, 7, 8, 9, 3]  # [CLS] this is an image . [SEP]
    # zero-byte train files -> reference black-canvas fallback, no raise
    train = ImageNetDataset(imagenet_dir, "train", tokenizer=tokenizer, canvas_hw=CANVAS)
    assert train[0]["pixel_values"].sum() == 0


# --------------------------------------------------------------------------
# Places365
# --------------------------------------------------------------------------


def test_places365_splits(tmp_path, tokenizer):
    root = tmp_path / "places365"
    for cls in ("abbey", "airfield", "zen_garden"):
        for i in range(55):
            _touch(str(root / "train" / cls / f"{i:08d}.jpg"))
        for i in range(4):
            _touch(str(root / "val" / cls / f"val_{i:08d}.jpg"))
    train = Places365Dataset(str(root), "train", tokenizer=tokenizer, canvas_hw=CANVAS)
    val = Places365Dataset(str(root), "val", tokenizer=tokenizer, canvas_hw=CANVAS)
    test = Places365Dataset(str(root), "test", tokenizer=tokenizer, canvas_hw=CANVAS)
    assert len(train) == 15 and len(val) == 150  # 55/class: 50 -> val
    assert len(test) == 12  # the val/ directory, dir-per-class
    assert not {f for f, _ in train.dataset} & {f for f, _ in val.dataset}
    assert {lb for _, lb in test.dataset} == {0, 1, 2}
    shot = Places365Dataset(str(root), "train", n_shot=2, subsample_seed=10,
                            tokenizer=tokenizer, canvas_hw=CANVAS)
    assert len(shot) == 6


# --------------------------------------------------------------------------
# iNaturalist 2019
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def inat_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("inat2019")
    # class 0: 30 examples, class 1: only 3 (a "small" class), class 2: 12
    counts = {0: 30, 1: 3, 2: 12}
    images, annots = [], []
    k = 0
    for cls, n in counts.items():
        for _ in range(n):
            fn = f"train_val2019/x/{k}.jpg"
            _touch(str(root / fn))
            images.append({"id": k, "file_name": fn})
            annots.append({"id": k, "image_id": k, "category_id": cls})
            k += 1
    (root / "train2019.json").write_text(
        json.dumps({"images": images, "annotations": annots}))
    (root / "val2019.json").write_text(
        json.dumps({"images": images[:5], "annotations": annots[:5]}))
    return str(root)


def test_inat_small_classes_kept_whole(inat_dir, tokenizer):
    train = Inat2019Dataset(inat_dir, "train", n_shot=5, subsample_seed=10,
                            tokenizer=tokenizer, canvas_hw=CANVAS)
    per_class = {}
    for _, lb in train.dataset:
        per_class[lb] = per_class.get(lb, 0) + 1
    # class 1 has 3 <= n_shot=5 examples -> kept whole, no val carved
    assert per_class[1] == 3
    # classes 0/2 subsampled to n_shot
    assert per_class[0] == 5 and per_class[2] == 5


def test_inat_val_is_capped_ratio(inat_dir, tokenizer):
    val = Inat2019Dataset(inat_dir, "val", tokenizer=tokenizer, canvas_hw=CANVAS)
    per_class = {}
    for _, lb in val.dataset:
        per_class[lb] = per_class.get(lb, 0) + 1
    # val = min(10% of class, 50): class0 30->3, class2 12->1; class1 none
    assert per_class == {0: 3, 2: 1}
    train = Inat2019Dataset(inat_dir, "train", tokenizer=tokenizer, canvas_hw=CANVAS)
    assert not {f for f, _ in train.dataset} & {f for f, _ in val.dataset}


def test_inat_test_reads_val_json(inat_dir, tokenizer):
    test = Inat2019Dataset(inat_dir, "test", tokenizer=tokenizer, canvas_hw=CANVAS)
    assert len(test) == 5


# --------------------------------------------------------------------------
# COCO multi-label classification
# --------------------------------------------------------------------------


@pytest.fixture()
def coco_dir(tmp_path):
    root = tmp_path / "ms-coco"
    # 20 images; detections use RAW category ids {1, 7, 90} (non-contiguous,
    # as in real COCO) -> remapped to classes {0, 1, 2}
    annots = []
    for img_i in range(20):
        _touch(str(root / "images" / f"{img_i:012d}.jpg"))
        annots.append({"image_id": img_i, "category_id": 1})
        if img_i % 2 == 0:
            annots.append({"image_id": img_i, "category_id": 7})
        if img_i == 3:
            annots.append({"image_id": img_i, "category_id": 90})
    ann = {"annotations": annots}
    d = root / "detections" / "annotations"
    os.makedirs(str(d))
    (d / "instances_train2017.json").write_text(json.dumps(ann))
    (d / "instances_val2017.json").write_text(json.dumps(ann))
    return str(root)


def test_coco_cls_multi_hot_and_splits(coco_dir, tokenizer):
    test = CocoClsDataset(coco_dir, "test", tokenizer=tokenizer, canvas_hw=CANVAS)
    assert len(test) == 20
    # raw category ids {1, 7, 90} remap (sorted) to classes {0, 1, 2}
    by_name = {os.path.basename(fn): cls for fn, cls in test.dataset}
    assert by_name["000000000003.jpg"] == [0, 2]  # cats {1, 90}
    assert by_name["000000000002.jpg"] == [0, 1]  # cats {1, 7}
    assert by_name["000000000001.jpg"] == [0]
    ex3 = test[[os.path.basename(f) for f, _ in test.dataset].index("000000000003.jpg")]
    assert ex3["labels"].shape == (80,)
    assert ex3["labels"].sum() == 2.0
    assert list(np.nonzero(ex3["labels"])[0]) == [0, 2]

    train = CocoClsDataset(coco_dir, "train", tokenizer=tokenizer, canvas_hw=CANVAS)
    val = CocoClsDataset(coco_dir, "val", tokenizer=tokenizer, canvas_hw=CANVAS)
    assert len(val) == 2 and len(train) == 18  # 10% val split
    assert not {f for f, _ in train.dataset} & {f for f, _ in val.dataset}


def test_coco_cls_percentage_subsample_and_cache(coco_dir, tokenizer):
    sub = CocoClsDataset(coco_dir, "train", n_shot=0.5, subsample_seed=10,
                         tokenizer=tokenizer, canvas_hw=CANVAS)
    assert len(sub) == 10  # 50% of the 20-image dataset
    # first construction wrote the parse cache; a reload must use it even if
    # the annotation file disappears (reference pickle-cache semantics)
    cache = os.path.join(coco_dir, "cached_train.pkl")
    assert os.path.exists(cache)
    os.remove(os.path.join(
        coco_dir, "detections", "annotations", "instances_train2017.json"))
    again = CocoClsDataset(coco_dir, "train", n_shot=0.5, subsample_seed=10,
                           tokenizer=tokenizer, canvas_hw=CANVAS)
    assert again.dataset == sub.dataset
    with open(cache, "rb") as f:
        assert len(pickle.load(f)) == 20


def test_build_vision_dataset_registry(coco_dir, tokenizer):
    ds = build_vision_dataset("coco-cls", coco_dir, "test",
                              tokenizer=tokenizer, canvas_hw=CANVAS)
    assert isinstance(ds, CocoClsDataset)
    with pytest.raises(KeyError):
        build_vision_dataset("not-a-task", coco_dir, "test")
