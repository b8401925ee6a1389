"""Host input-pipeline cost model (data/host_cost.py): the measured per-op
constants must prove `workers x (1/per_example_cost) > headline ex/s` — the
reference's defining defect was exactly an input-bound pipeline (reference
src/modeling/vilt.py:83-96), so this framework carries the proof as a
committed artifact (HOST_FEED_r03.json) plus these mechanism checks."""

import json
import os

import numpy as np
import pytest

from climb_tpu.data.host_cost import (
    cost_model,
    make_test_jpeg,
    make_wordpiece_vocab,
    measure_host_costs,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cost_model_math():
    measured = {
        "jpeg_to_canvas_s": 4e-3,
        "tokenize_s": 1e-4,
        "bytes_per_example": 750_000,
    }
    m = cost_model(measured, headline_ex_s=873.3, workers=16,
                   host_bw_bytes_per_s=5e9)
    per_ex = 4e-3 + 1e-4 + 750_000 / 5e9
    assert m["sustained_ex_s"] == pytest.approx(16 / per_ex, rel=1e-3)
    assert m["workers_needed_for_headline"] == int(np.ceil(873.3 * per_ex))
    assert m["sustains_headline"] is (16 / per_ex > 873.3)
    # a 1-worker host must NOT sustain it (4ms/example ~ 250 ex/s/worker)
    assert not cost_model(measured, 873.3, 1)["sustains_headline"]


def test_measure_host_costs_live(tmp_path):
    """The measurement functions run against the production ops (small
    canvas so the test stays fast) and yield finite, positive costs."""
    measured = measure_host_costs(canvas_hw=(64, 96), text_len=16, batch=8,
                                  iters=2, tmpdir=str(tmp_path),
                                  bw_nbytes=1 << 20)
    for key in ("jpeg_to_canvas_s", "tokenize_s", "collate_s_raw"):
        assert 0 < measured[key] < 10.0, (key, measured[key])
    assert measured["bytes_per_example"] > 64 * 96 * 3
    assert measured["host_bw_bytes_per_s"] > 1e6
    m = cost_model(measured, headline_ex_s=100.0, workers=4)
    assert m["sustained_ex_s"] > 0 and "total" in m["per_example_ms"]


def test_test_jpeg_and_vocab_builders(tmp_path):
    data = make_test_jpeg(64, 96)
    assert data[:2] == b"\xff\xd8"  # JPEG SOI
    vocab = make_wordpiece_vocab(str(tmp_path / "v.txt"), n_words=200)
    lines = open(vocab).read().splitlines()
    assert len(lines) == 200 and lines[0] == "[PAD]"
    assert any(l.startswith("##") for l in lines)


def test_committed_host_feed_artifact():
    """The committed constants must prove the headline is host-feedable on a
    sane production host — the artifact IS the claim, this test keeps it
    honest against the recorded numbers."""
    path = os.path.join(REPO, "HOST_FEED_r03.json")
    if not os.path.exists(path):
        pytest.skip("HOST_FEED_r03.json not generated yet")
    with open(path) as f:
        report = json.load(f)
    ref = report["model_reference_host"]
    assert ref["sustains_headline"] is True
    # recompute the inequality from the recorded raw constants
    measured = report["measured"]
    per_ex = (measured["jpeg_to_canvas_s"] + measured["tokenize_s"]
              + measured["bytes_per_example"] / (ref["host_bw_assumed_gb_s"] * 1e9))
    assert ref["workers"] * (1.0 / per_ex) > ref["headline_ex_s"]
    # and the production C++ path is what was measured
    assert measured["jpeg_to_canvas_impl"] == "native"
