"""Vision-only task datasets (Phase II): ImageNet, Places365, iNat2019, COCO-cls.

Parity targets in reference ``src/data/vision_datasets/``:
- ImageNet (imagenet_dataset.py): dir-per-class train; val = 50/class carved
  from train (shuffle seed 2022); test = original val via LOC_val_solution.csv;
  n-shot/class subsampling with subsample_seed.
- Places365 (places365_dataset.py): same pattern, 365 classes, .jpg files.
- iNat2019 (inat2019_dataset.py): json annotations; classes with <= n_shot
  examples kept whole; val = min(10%, 50)/class.
- COCO-cls (coco_cls_dataset.py): multi-label 80-way from instance
  detections (instances_*2017.json parsed directly — no pycocotools needed);
  10% val split; percentage subsampling; 80-dim multi-hot labels.

All emit the fixed-shape schema with the dummy text "This is an image."
(reference batch_collate, e.g. imagenet_dataset.py:141-146) pre-tokenized
once.
"""

import csv
import glob
import json
import logging
import os
import pickle
import random
from collections import defaultdict
from typing import Optional, Tuple

import numpy as np

from climb_tpu.data.image_backbones import CanvasImageProvider
from climb_tpu.data.tokenization import load_tokenizer

logger = logging.getLogger(__name__)

DUMMY_TEXT = "This is an image."


class VisionDatasetBase(CanvasImageProvider):
    def __init__(self, tokenizer=None, max_text_len: int = 40, canvas_hw=(384, 640)):
        super().__init__(canvas_hw)
        tok = tokenizer or load_tokenizer()
        ids, mask, types = tok.encode(DUMMY_TEXT, max_text_len)
        self._text = {"input_ids": ids, "text_mask": mask, "token_type_ids": types}
        self.dataset = []  # list of [filename, label(s)]

    def __len__(self):
        return len(self.dataset)

    def _example(self, filename, label):
        pixel_values, patch_hw = self.load_canvas(filename)
        return {
            **self._text,
            "pixel_values": pixel_values,
            "patch_hw": np.asarray(patch_hw, np.int32),
            "labels": label,
        }

    def __getitem__(self, i):
        filename, label = self.dataset[i]
        return self._example(filename, np.int32(label))

    def canvas_widths(self):
        """Aspect-bucketing hint: per-example needed canvas width from image
        headers (no decode) — see DataLoader(bucket_widths=...)."""
        from climb_tpu.data.image_pipeline import predict_canvas_widths

        memo = getattr(self, "_dims_memo", None)
        if memo is None:
            memo = self._dims_memo = {}
        return predict_canvas_widths(
            [[fn] for fn, _ in self.dataset], self.canvas_hw, memo=memo
        )


def _class_split_subsample(per_class, mode, n_shot, subsample_seed,
                           val_num_per_class=50, keep_small_classes=False,
                           val_ratio_cap: Optional[float] = None):
    """Reference get_train_val_split semantics (imagenet_dataset.py:55-83 /
    inat2019_dataset.py:51-85): per-class seed-2022 shuffle, carve val from
    the tail, shuffle train with subsample_seed and keep n_shot per class.

    Determinism deviation: the reference seeds the train shuffle with
    ``self.subsample_seed`` even when it is None (system entropy), making the
    full-train *order* nondeterministic across constructions — which would
    silently break this framework's elastic-resume index mapping. Here a
    missing subsample_seed falls back to the fixed split seed (2022); the
    reference's drivers always pass a seed, so every reference-reachable
    configuration is unchanged."""
    train_out, val_out = [], []
    train_seed = subsample_seed if subsample_seed is not None else 2022
    for cls_data in per_class:
        cls_data = list(cls_data)
        if keep_small_classes and len(cls_data) <= (n_shot or 0):
            train_out.extend(cls_data)
            continue
        n_val = val_num_per_class
        if val_ratio_cap is not None:
            n_val = min(int(len(cls_data) * val_ratio_cap), val_num_per_class)
        n_train = len(cls_data) - n_val
        random.seed(2022)
        random.shuffle(cls_data)
        train_cls = cls_data[:n_train]
        val_out.extend(cls_data[n_train:])
        if mode == "train":
            random.seed(train_seed)
            random.shuffle(train_cls)
            train_out.extend(train_cls[: n_shot] if n_shot else train_cls)
    return train_out if mode == "train" else val_out


class ImageNetDataset(VisionDatasetBase):
    NUM_CLASSES = 1000

    def __init__(self, data_dir, mode, n_shot=None, subsample_seed=None,
                 tokenizer=None, max_text_len=40, canvas_hw=(384, 640)):
        super().__init__(tokenizer, max_text_len, canvas_hw)
        self.data_dir = data_dir
        all_classes = sorted(os.listdir(os.path.join(data_dir, "train")))
        if mode == "test":
            dir2lb = {name: i for i, name in enumerate(all_classes)}
            with open(os.path.join(data_dir, "LOC_val_solution.csv")) as f:
                for line in csv.DictReader(f):
                    fn = os.path.join(data_dir, "val", line["ImageId"] + ".JPEG")
                    label = dir2lb[line["PredictionString"].split()[0]]
                    self.dataset.append([fn, label])
        else:
            per_class = []
            for label, dir_name in enumerate(all_classes):
                fns = sorted(glob.glob(os.path.join(data_dir, "train", dir_name, "*.JPEG")))
                per_class.append([[fn, label] for fn in fns])
            self.dataset = _class_split_subsample(per_class, mode, n_shot, subsample_seed)
        logger.info("ImageNet %s: %d images", mode, len(self.dataset))


class Places365Dataset(VisionDatasetBase):
    NUM_CLASSES = 365

    def __init__(self, data_dir, mode, n_shot=None, subsample_seed=None,
                 tokenizer=None, max_text_len=40, canvas_hw=(384, 640)):
        super().__init__(tokenizer, max_text_len, canvas_hw)
        split_dir = "val" if mode == "test" else "train"
        image_dir = os.path.join(data_dir, split_dir)
        all_classes = sorted(os.listdir(os.path.join(data_dir, "train")))
        if mode == "test":
            for label, dir_name in enumerate(all_classes):
                for fn in sorted(glob.glob(os.path.join(image_dir, dir_name, "*.jpg"))):
                    self.dataset.append([fn, label])
        else:
            per_class = []
            for label, dir_name in enumerate(all_classes):
                fns = sorted(glob.glob(os.path.join(image_dir, dir_name, "*.jpg")))
                per_class.append([[fn, label] for fn in fns])
            self.dataset = _class_split_subsample(per_class, mode, n_shot, subsample_seed)
        logger.info("Places365 %s: %d images", mode, len(self.dataset))


class Inat2019Dataset(VisionDatasetBase):
    NUM_CLASSES = 1010

    def __init__(self, data_dir, mode, n_shot=None, subsample_seed=None,
                 tokenizer=None, max_text_len=40, canvas_hw=(384, 640)):
        super().__init__(tokenizer, max_text_len, canvas_hw)
        remap = {"train": "train", "val": "train", "test": "val"}
        with open(os.path.join(data_dir, f"{remap[mode]}2019.json")) as f:
            ann = json.load(f)
        fns = [a["file_name"] for a in ann["images"]]
        labels = [a["category_id"] for a in ann["annotations"]]
        assert len(fns) == len(labels)
        if mode == "test":
            self.dataset = [[os.path.join(data_dir, fn), lb] for fn, lb in zip(fns, labels)]
        else:
            n_cls = max(labels) + 1
            per_class = [[] for _ in range(n_cls)]
            for fn, lb in zip(fns, labels):
                per_class[lb].append([os.path.join(data_dir, fn), lb])
            self.dataset = _class_split_subsample(
                per_class, mode, n_shot, subsample_seed,
                keep_small_classes=True, val_ratio_cap=0.1,
            )
        logger.info("iNat2019 %s: %d images", mode, len(self.dataset))


class CocoClsDataset(VisionDatasetBase):
    """Multi-label 80-way object classification from COCO detections."""

    NUM_CLASSES = 80

    def __init__(self, data_dir, mode, n_shot=None, subsample_seed=None,
                 tokenizer=None, max_text_len=40, canvas_hw=(384, 640)):
        # n_shot here is a *percentage* of the training set (reference
        # coco_cls usage, train_vision.py:119-122)
        super().__init__(tokenizer, max_text_len, canvas_hw)
        self.mode = mode
        fn_mode = {"train": "train", "val": "train", "test": "val"}[mode]
        images_dir = os.path.join(data_dir, "images")
        annot_file = os.path.join(
            data_dir, "detections", "annotations", f"instances_{fn_mode}2017.json"
        )
        cached = os.path.join(data_dir, f"cached_{fn_mode}.pkl")
        if os.path.exists(cached):
            with open(cached, "rb") as f:
                dataset = pickle.load(f)
        else:
            with open(annot_file) as f:
                ann = json.load(f)
            cat_ids = sorted({a["category_id"] for a in ann["annotations"]})
            cat2cls = {c: i for i, c in enumerate(cat_ids)}
            img2classes = defaultdict(set)
            for a in ann["annotations"]:
                img2classes[a["image_id"]].add(cat2cls[a["category_id"]])
            dataset = []
            for img_i in sorted(img2classes.keys()):
                img_fn = os.path.join(images_dir, "{:012d}.jpg".format(img_i))
                dataset.append([img_fn, sorted(img2classes[img_i])])
            with open(cached, "wb") as f:
                pickle.dump(dataset, f)

        if mode == "test":
            self.dataset = dataset
        else:
            # 10% val split with seed-2022 shuffle; train subsampled by
            # percentage (coco_cls_dataset.py:55-81)
            random.seed(2022)
            random.shuffle(dataset)
            n_val = int(len(dataset) * 0.1)
            if mode == "val":
                self.dataset = dataset[:n_val]
            else:
                train = dataset[n_val:]
                random.seed(subsample_seed)
                random.shuffle(train)
                if n_shot:
                    n_train = int(n_shot * len(dataset))
                    assert n_train < len(train)
                    train = train[:n_train]
                self.dataset = train
        logger.info("COCO-cls %s: %d images", mode, len(self.dataset))

    def __getitem__(self, i):
        filename, class_ids = self.dataset[i]
        multi_hot = np.zeros((self.NUM_CLASSES,), np.float32)
        multi_hot[np.asarray(class_ids, np.int64)] = 1.0
        return self._example(filename, multi_hot)


VISION_DATASETS = {
    "imagenet": ImageNetDataset,
    "places365": Places365Dataset,
    "inat2019": Inat2019Dataset,
    "coco-cls": CocoClsDataset,
}


def build_vision_dataset(task_key, data_dir, split, n_shot=None, subsample_seed=None,
                         tokenizer=None, max_text_len=40, canvas_hw=(384, 640)):
    cls = VISION_DATASETS[task_key]
    return cls(data_dir, split, n_shot, subsample_seed, tokenizer, max_text_len, canvas_hw)
