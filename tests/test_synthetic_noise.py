"""The r05 synthetic difficulty knob and signal-strength fixes.

These guard the calibration the hardware smoke benchmarks depend on:
label_noise caps the Bayes-optimal dev score at 1-p (flips always encode a
WRONG class, so a signal-following predictor misses exactly the flipped
fraction) so CL algorithms separate; repeated markers make the signal
learnable from random init; the
multi-choice text scheme must carry PER-CHOICE markers (a shared label-index
token is invisible to a per-choice forward).
"""

import numpy as np
import pytest

from climb_tpu.cli.common import apply_task_config_overrides
from climb_tpu.data.synthetic import SyntheticTextDataset, SyntheticVLDataset

pytestmark = pytest.mark.smoke


def test_label_noise_flip_fraction_and_validity():
    ds = SyntheticVLDataset(size=4000, num_labels=16, label_noise=0.3, seed=3)
    flipped = ds.signal_labels != ds.labels
    assert 0.25 < flipped.mean() < 0.35  # ~binomial(0.3)
    # a flipped signal is always a WRONG class (never accidentally true)
    assert (ds.signal_labels[flipped] != ds.labels[flipped]).all()
    # targets stay true: emitted labels come from ds.labels
    i = int(np.where(flipped)[0][0])
    assert int(ds[i]["labels"]) == int(ds.labels[i])


def test_zero_noise_keeps_signal_equal_to_labels():
    ds = SyntheticVLDataset(size=200, num_labels=8, label_noise=0.0, seed=1)
    assert (ds.signal_labels == ds.labels).all()


def test_marker_repeats_across_text_positions():
    ds = SyntheticVLDataset(size=8, num_labels=8, seed=0)
    ex = ds[0]
    ids = ex["input_ids"]
    marker = 103 + (int(ds.signal_labels[0]) % 895)
    n = int(ex["text_mask"].sum())
    want = np.arange(1, n - 1, 2)
    assert (ids[want] == marker).all()
    assert ids[0] == 101 and ids[n - 1] == 102


def test_noisy_marker_encodes_signal_not_label():
    ds = SyntheticVLDataset(size=2000, num_labels=16, label_noise=0.5, seed=9)
    flipped = np.where(ds.signal_labels != ds.labels)[0]
    i = int(flipped[0])
    ids = ds[i]["input_ids"]
    assert ids[1] == 103 + (int(ds.signal_labels[i]) % 895)
    assert ids[1] != 103 + (int(ds.labels[i]) % 895)


def test_multichoice_vl_marker_follows_signal():
    ds = SyntheticVLDataset(size=400, num_labels=4, model_type="multi-choice",
                            num_choices=4, label_noise=0.4, seed=5)
    flipped = np.where(ds.signal_labels != ds.labels)[0]
    i = int(flipped[0])
    ex = ds[i]
    sig = int(ds.signal_labels[i])
    for c in range(4):
        row = ex["input_ids"][c]
        n = int(ex["text_mask"][c].sum())
        assert (row[1:n - 1:2] == (999 if c == sig else 998)).all()


def test_text_dataset_multichoice_markers_discriminate():
    """Per-choice forwards can only use per-choice content: the correct
    choice must carry a DIFFERENT marker (999) than the wrong ones (998)."""
    ds = SyntheticTextDataset(size=16, num_labels=4, model_type="multi-choice",
                              num_choices=4, seed=2)
    for i in range(len(ds)):
        ex = ds[i]
        label = int(ex["labels"])
        for c in range(4):
            row = ex["input_ids"][c]
            n = int(ex["text_mask"][c].sum())
            assert (row[1:n - 1:2] == (999 if c == label else 998)).all()


def test_text_dataset_classification_marker():
    ds = SyntheticTextDataset(size=16, num_labels=3, seed=4)
    for i in range(len(ds)):
        ex = ds[i]
        n = int(ex["text_mask"].sum())
        marker = 103 + (int(ex["labels"]) % 895)
        assert (ex["input_ids"][1:n - 1:2] == marker).all()


def test_task_config_overrides_parse_and_validate():
    base = {"vqa": {"lr": 1e-4, "num_epochs": 10}, "vcr": {"lr": 1e-4}}
    out = apply_task_config_overrides(base, "vqa.lr=4e-4,vqa.num_epochs=20")
    assert out["vqa"] == {"lr": 4e-4, "num_epochs": 20}
    assert out["vcr"] == base["vcr"]
    assert base["vqa"]["lr"] == 1e-4  # input untouched
    assert apply_task_config_overrides(base, "") is base
    with pytest.raises(ValueError):
        apply_task_config_overrides(base, "nope.lr=1")
    with pytest.raises(ValueError):
        apply_task_config_overrides(base, "vqa.lr")
    with pytest.raises(ValueError):  # typoed hyperparameter must not no-op
        apply_task_config_overrides(base, "vqa.num_epoch=20")
