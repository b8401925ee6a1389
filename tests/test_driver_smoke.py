"""ONE end-to-end driver run for the `-m smoke` gate: a --tiny --synthetic
single-task upstream experiment (train + eval + resume, ~30s on the CPU
mesh), so the fast subset covers driver WIRING — arg parsing, model factory,
trainer loop, checkpoint layout, eval phase, resume-and-skip — not just
units. The deep driver matrix (mesh/fsdp/buckets/corrupt-checkpoint) lives
in tests/test_driver.py."""

import json

from climb_tpu.cli.train_upstream_continual_learning import main as upstream_main


def test_driver_smoke_train_eval_resume(tmp_path):
    base = [
        "--encoder_name", "vilt",
        "--pretrained_model_name", "scratch",
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--ordered_cl_tasks", "snli-ve",
        "--cl_algorithm", "singletask_ft",
        "--do_train", "--do_eval",
    ]
    upstream_main(base)
    exp = tmp_path / "vilt-singletask_ft-task0_snli-ve"
    results = json.loads((exp / "results.json").read_text())
    assert results[0]["task_key"] == "snli-ve"
    assert results[0]["best_score"] >= 0
    assert (exp / "checkpoints" / "task0_snli-ve" / "model").exists()
    assert (exp / "eval_results.json").exists()

    # resume: rerun must skip the finished task, leaving results untouched
    before = (exp / "results.json").read_text()
    upstream_main(base)
    assert (exp / "results.json").read_text() == before
