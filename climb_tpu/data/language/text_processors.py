"""Language-only task processors (parity: reference
``src/data/language_datasets/text_processors.py``).

Each processor turns a task's raw files into example dicts
{text_a, text_b(list), merged_text, label}; train/dev are split from the
original training set with seed 2022 / 30% (the original dev set serves as
the test set since test labels are unavailable) — ``split_train_dev``
reference :71-93.
"""

import csv
import json
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def split_train_dev(data, seed: int = 2022, dev_ratio: float = 0.3):
    """Deterministic train/dev split (reference semantics: np.random.choice
    of dev indices with the given seed)."""
    data = list(data)
    n = len(data)
    np.random.seed(seed)
    dev_ids = set(np.random.choice(n, int(n * dev_ratio), replace=False))
    train_data, dev_data = [], []
    for i, dt in enumerate(data):
        (dev_data if i in dev_ids else train_data).append(dt)
    return train_data, dev_data, dev_ids


class DataProcessor:
    """Base class for language-only task converters."""

    def __init__(self):
        label_list = self._set_label_list()
        self.label_map = {label: i for i, label in enumerate(label_list)}

    def get_train_examples(self, data_dir):
        raise NotImplementedError

    def get_dev_examples(self, data_dir):
        raise NotImplementedError

    def get_test_examples(self, data_dir):
        raise NotImplementedError

    @classmethod
    def _to_example(cls, example_id, text_a=None, text_b=None, text_c=None, label=None, desc=None):
        merged_text = [f"{text_a} [SEP] {t_b}" for t_b in (text_b or [])]
        return {
            "example_id": example_id,
            "text_a": text_a,
            "text_b": text_b,
            "text_c": text_c,
            "merged_text": merged_text,
            "label": label,
            "description": desc,
        }

    @classmethod
    def _read_csv(cls, input_file):
        with open(input_file, encoding="utf-8") as f:
            return list(csv.reader(f))

    @classmethod
    def _read_jsonl(cls, input_file):
        with open(input_file, encoding="utf-8") as f:
            return [json.loads(line) for line in f if line.strip()]


class HellaSwagProcessor(DataProcessor):
    def _set_label_list(self):
        return [0, 1, 2, 3]

    def _examples(self, data, has_label=True):
        return [
            self._to_example(
                example_id=idx,
                text_a=dt["ctx"],
                text_b=dt["endings"],
                label=self.label_map[dt["label"]] if has_label else None,
                desc="Multiple-Choice; text_a: Ctx; text_b: ending",
            )
            for idx, dt in enumerate(data)
        ]

    def get_train_examples(self, data_dir):
        data = self._examples(self._read_jsonl(os.path.join(data_dir, "hellaswag_train.jsonl")))
        train, _, self.dev_ids = split_train_dev(data)
        return train

    def get_dev_examples(self, data_dir):
        data = self._examples(self._read_jsonl(os.path.join(data_dir, "hellaswag_train.jsonl")))
        _, dev, self.dev_ids = split_train_dev(data)
        return dev

    def get_test_examples(self, data_dir):
        return self._examples(self._read_jsonl(os.path.join(data_dir, "hellaswag_val.jsonl")))


class PIQAProcessor(DataProcessor):
    def _set_label_list(self):
        return ["0", "1"]

    def _examples(self, data, label_path, has_label=True):
        if has_label:
            with open(label_path, encoding="utf-8") as f:
                labels = f.read().splitlines()
        else:
            labels = ["0"] * len(data)
        return [
            self._to_example(
                example_id=idx,
                text_a=dt["goal"],
                text_b=[dt["sol1"], dt["sol2"]],
                label=self.label_map[lb] if has_label else None,
                desc="Multiple-Choice; text_a: Ctx; text_b: Ans",
            )
            for idx, (dt, lb) in enumerate(zip(data, labels))
        ]

    def get_train_examples(self, data_dir):
        data = self._examples(
            self._read_jsonl(os.path.join(data_dir, "train.jsonl")),
            os.path.join(data_dir, "train-labels.lst"),
        )
        train, _, self.dev_ids = split_train_dev(data)
        return train

    def get_dev_examples(self, data_dir):
        data = self._examples(
            self._read_jsonl(os.path.join(data_dir, "train.jsonl")),
            os.path.join(data_dir, "train-labels.lst"),
        )
        _, dev, self.dev_ids = split_train_dev(data)
        return dev

    def get_test_examples(self, data_dir):
        return self._examples(
            self._read_jsonl(os.path.join(data_dir, "valid.jsonl")),
            os.path.join(data_dir, "valid-labels.lst"),
        )


class CommonsenseQAProcessor(DataProcessor):
    def _set_label_list(self):
        return ["A", "B", "C", "D", "E"]

    def _examples(self, data, has_label=True):
        return [
            self._to_example(
                example_id=idx,
                text_a=dt["question"]["stem"],
                text_b=[ch["text"] for ch in dt["question"]["choices"]],
                label=self.label_map[dt["answerKey"]] if has_label else None,
                desc="Multiple-Choice; text_a: Ctx; text_b: Ans",
            )
            for idx, dt in enumerate(data)
        ]

    def get_train_examples(self, data_dir):
        data = self._examples(self._read_jsonl(os.path.join(data_dir, "train_rand_split.jsonl")))
        train, _, self.dev_ids = split_train_dev(data)
        return train

    def get_dev_examples(self, data_dir):
        data = self._examples(self._read_jsonl(os.path.join(data_dir, "train_rand_split.jsonl")))
        _, dev, self.dev_ids = split_train_dev(data)
        return dev

    def get_test_examples(self, data_dir):
        return self._examples(self._read_jsonl(os.path.join(data_dir, "dev_rand_split.jsonl")))


class COSMOSQAProcessor(DataProcessor):
    """Present in the reference but unused by its configs (text_processors.py:226)."""

    def _set_label_list(self):
        return ["0", "1", "2", "3"]

    def _examples(self, data, has_label=True):
        return [
            self._to_example(
                example_id=line[0],
                text_a=line[1],
                text_b=[line[3], line[4], line[5], line[6]],
                text_c=line[2],
                label=self.label_map[line[7]] if has_label else None,
                desc="Multiple-Choice; text_a: Ctx; text_b: Ans; text_c: Ques",
            )
            for line in data[1:]
        ]

    def get_train_examples(self, data_dir):
        data = self._examples(self._read_csv(os.path.join(data_dir, "train.csv")))
        train, _, self.dev_ids = split_train_dev(data)
        return train

    def get_dev_examples(self, data_dir):
        data = self._examples(self._read_csv(os.path.join(data_dir, "train.csv")))
        _, dev, self.dev_ids = split_train_dev(data)
        return dev

    def get_test_examples(self, data_dir):
        return self._examples(self._read_csv(os.path.join(data_dir, "valid.csv")))


class IMDBProcessor:
    """IMDb via HF datasets (reference text_processors.py:268), with a local
    jsonl fallback ({data_dir}/imdb_{train,test}.jsonl with 'text'/'label')
    for hermetic environments."""

    def __init__(self, cache_dir="cache_imdb", data_dir=None):
        data = self._load(cache_dir, data_dir)
        self.train_data, self.dev_data, self.dev_ids = split_train_dev(data["train"])
        self.test_data = data["test"]

    def _load(self, cache_dir, data_dir):
        if data_dir:
            train_fn = os.path.join(data_dir, "imdb_train.jsonl")
            if os.path.exists(train_fn):
                read = DataProcessor._read_jsonl
                return {
                    "train": read(train_fn),
                    "test": read(os.path.join(data_dir, "imdb_test.jsonl")),
                }
        from datasets import load_dataset

        ds = load_dataset("imdb", cache_dir=cache_dir)
        return {"train": list(ds["train"]), "test": list(ds["test"])}

    def get_train_examples(self, data_dir=None):
        return self.train_data

    def get_dev_examples(self, data_dir=None):
        return self.dev_data

    def get_test_examples(self, data_dir=None):
        return self.test_data


class GLUEProcessor:
    """GLUE tasks (SST-2) via HF datasets (reference text_processors.py:286),
    with the same local jsonl fallback ({data_dir}/{task}_{train,validation}.jsonl)."""

    def __init__(self, task="sst2", cache_dir="cache_glue", data_dir=None):
        data = self._load(task, cache_dir, data_dir)
        self.train_data, self.dev_data, self.dev_ids = split_train_dev(data["train"])
        self.test_data = data["validation"]

    def _load(self, task, cache_dir, data_dir):
        if data_dir:
            train_fn = os.path.join(data_dir, f"{task}_train.jsonl")
            if os.path.exists(train_fn):
                read = DataProcessor._read_jsonl
                return {
                    "train": read(train_fn),
                    "validation": read(os.path.join(data_dir, f"{task}_validation.jsonl")),
                }
        from datasets import load_dataset

        ds = load_dataset("glue", task, cache_dir=cache_dir)
        return {"train": list(ds["train"]), "validation": list(ds["validation"])}

    def get_train_examples(self, data_dir=None):
        return self.train_data

    def get_dev_examples(self, data_dir=None):
        return self.dev_data

    def get_test_examples(self, data_dir=None):
        return self.test_data


PROCESSOR_MAP = {
    "piqa": PIQAProcessor,
    "hellaswag": HellaSwagProcessor,
    "commonsenseqa": CommonsenseQAProcessor,
    "cosmosqa": COSMOSQAProcessor,
    "imdb": IMDBProcessor,
    "sst2": GLUEProcessor,
}
