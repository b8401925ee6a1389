"""The REAL-data (non---synthetic) path through a full Phase I driver run.

r04 verdict item: real-format annotation parsing, pickle caching, image
backbones, the AOT fixed-shape pipeline, and the trainers composed only at
the per-dataset unit level (tests/test_real_datasets.py) — no driver run
ever exercised annotation parse -> cache -> image backbone -> AOT pipeline
-> train -> eval -> results.json end-to-end. This test fabricates a
miniature CLiMB data directory in the reference's on-disk formats
(SURVEY.md section 2.4: vqa_dataset.py:72-130, nlvr2_dataset.py:53-116,
snli_ve_dataset.py:64-116, vcr_dataset.py:40-125) and drives
``train_upstream_continual_learning`` over all four tasks WITHOUT
``--synthetic``.
"""

import json
import os
import pickle

import pytest

from climb_tpu.cli.train_upstream_continual_learning import main as upstream_main

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] a the cat dog is on mat red blue two "
    "person play ##ing run ##s what color be yes no girl boy say hello "
    "gray casey riley , . ? ! and of to in it".split()
)


def _write_img(path, size=(100, 80), color=(120, 30, 200)):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", size, color).save(path)


@pytest.fixture(scope="module")
def climb_dir(tmp_path_factory):
    """Mini CLiMB data root with train AND eval splits for all four tasks."""
    root = tmp_path_factory.mktemp("climb_real")

    # --- ms-coco images + vqav2 (train/val question+annotation JSONs) ---
    for i in range(1, 5):
        _write_img(str(root / "ms-coco" / "images" / f"COCO_train2014_{i:012d}.jpg"),
                   color=(40 * i, 20, 10))
    vqa = root / "vqav2"
    os.makedirs(vqa, exist_ok=True)
    answers = ["red", "blue", "two", "yes"]
    for split, ids in (("train", [1, 2, 3, 4]), ("val", [1, 2])):
        qs = [{"question_id": 10 * i, "image_id": i,
               "question": "what color is the cat?"} for i in ids]
        anns = [{"question_id": 10 * i, "image_id": i,
                 "multiple_choice_answer": answers[i % 4],
                 "answers": [{"answer": answers[i % 4]}] * 7
                            + [{"answer": "blue"}] * 3} for i in ids]
        (vqa / f"v2_OpenEnded_mscoco_{split}2014_questions.json").write_text(
            json.dumps({"questions": qs}))
        (vqa / f"v2_mscoco_{split}2014_annotations.json").write_text(
            json.dumps({"annotations": anns}))
    with open(vqa / "ans2label.pkl", "wb") as f:
        pickle.dump({"red": 0, "blue": 1, "two": 2, "yes": 3}, f)

    # --- nlvr2 (split rename train/dev; per-split image dirs) ---
    nlvr = root / "nlvr2"
    os.makedirs(nlvr / "data", exist_ok=True)
    for split, n in (("train", 4), ("dev", 2)):
        lines = []
        for i in range(n):
            stem = f"{split}-{i}-0"
            _write_img(str(nlvr / "images" / split / f"{stem}-img0.png"))
            _write_img(str(nlvr / "images" / split / f"{stem}-img1.png"))
            lines.append(json.dumps({
                "identifier": f"{stem}-{i}",
                "sentence": "two dogs play on the mat",
                "label": "True" if i % 2 else "False",
            }))
        (nlvr / "data" / f"{split}.json").write_text("\n".join(lines))

    # --- snli-ve over flickr30k ---
    for i in range(1, 4):
        _write_img(str(root / "flickr30k" / "flickr30k_images" / f"{i}.jpg"))
    sv = root / "snli-ve"
    os.makedirs(sv, exist_ok=True)
    cats = ["entailment", "contradiction", "neutral"]
    for split, n in (("train", 6), ("dev", 3)):
        lines = [json.dumps({"Flickr30K_ID": str(1 + (i % 3)),
                             "sentence2": "the cat is on the mat",
                             "gold_label": cats[i % 3]}) for i in range(n)]
        (sv / f"snli_ve_{split}.jsonl").write_text("\n".join(lines))

    # --- vcr (annotation jsonl + pre-drawn bbox images per split) ---
    vcr = root / "vcr"
    os.makedirs(vcr / "annotation", exist_ok=True)
    for split, n in (("train", 4), ("dev", 2)):
        lines = []
        for i in range(n):
            annot_id = f"{split}-{i}"
            _write_img(str(vcr / "drawn_images" / "bbox" / split / "qa"
                           / f"{annot_id}.jpg"))
            lines.append(json.dumps({
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
        (vcr / "annotation" / f"{split}.jsonl").write_text("\n".join(lines))

    (root / "vocab.txt").write_text("\n".join(VOCAB))
    return str(root)


def test_upstream_driver_over_real_format_data(climb_dir, tmp_path):
    """sequential_ft over vqa,nlvr2,snli-ve,vcr from on-disk annotation files
    (no --synthetic): parse -> pickle cache -> image backbone -> AOT pipeline
    -> train -> per-epoch eval -> checkpoints -> eval phase -> results JSONs."""
    out = tmp_path / "out"
    upstream_main([
        "--encoder_name", "vilt", "--pretrained_model_name", "scratch",
        "--ordered_cl_tasks", "vqa,nlvr2,snli-ve,vcr",
        "--cl_algorithm", "sequential_ft",
        "--climb_data_dir", climb_dir,
        "--vocab_path", os.path.join(climb_dir, "vocab.txt"),
        "--output_dir", str(out),
        "--do_train", "--do_eval",
        "--tiny", "--batch_size", "4", "--seed", "42",
    ])
    exp = out / ("vilt-sequential_ft-task0_vqa-task1_nlvr2"
                 "-task2_snli-ve-task3_vcr")
    results = json.loads((exp / "results.json").read_text())
    assert [r["task_key"] for r in results] == ["vqa", "nlvr2", "snli-ve", "vcr"]
    for r in results:
        assert 0.0 <= r["best_score"] <= 100.0
    ev = json.loads((exp / "eval_results.json").read_text())
    assert set(ev["upstream_knowledge_transfer"]) == {"vqa", "nlvr2",
                                                      "snli-ve", "vcr"}
    # the forgetting matrix covers every (later ckpt, earlier task) pair
    assert "vqa" in ev["forgetting"]["nlvr2"]
    assert set(ev["forgetting"]["vcr"]) == {"vqa", "nlvr2", "snli-ve"}
    # parse caches were written (reference pickle-cache semantics)
    assert os.path.exists(os.path.join(climb_dir, "vqav2", "cached_vqa_data",
                                       "vqa_train.pkl"))
    assert os.path.exists(os.path.join(climb_dir, "nlvr2", "cached_nlvr2_data",
                                       "train.pkl"))


def test_real_format_resume_reuses_caches(climb_dir, tmp_path):
    """A second driver invocation over the same data dir resumes from task
    checkpoints and reloads the pickle caches (no re-parse)."""
    out = tmp_path / "out2"
    argv = [
        "--encoder_name", "vilt", "--pretrained_model_name", "scratch",
        "--ordered_cl_tasks", "vqa,nlvr2",
        "--cl_algorithm", "sequential_ft",
        "--climb_data_dir", climb_dir,
        "--vocab_path", os.path.join(climb_dir, "vocab.txt"),
        "--output_dir", str(out),
        "--do_train", "--tiny", "--batch_size", "4", "--seed", "7",
    ]
    upstream_main(argv)
    exp = out / "vilt-sequential_ft-task0_vqa-task1_nlvr2"
    first = json.loads((exp / "results.json").read_text())
    # resume path: results.json is reloaded, training skipped
    upstream_main(argv)
    second = json.loads((exp / "results.json").read_text())
    assert first == second
