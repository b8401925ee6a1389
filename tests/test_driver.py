"""End-to-end Phase I driver runs (in-process, synthetic tiny).

Covers the reference driver semantics: experiment naming, results.json,
checkpoint layout, resume-and-skip, and the transfer/forgetting eval phase.
"""

import json
import os

import pytest

from climb_tpu.cli.train_upstream_continual_learning import (
    experiment_name_for,
    main as upstream_main,
)

BASE = [
    "--encoder_name", "vilt",
    "--pretrained_model_name", "scratch",
    "--climb_data_dir", "/tmp/unused",
    "--synthetic", "--tiny", "--synthetic_train_size", "16",
    "--batch_size", "8",
]


def run(outdir, *extra):
    upstream_main(BASE + ["--output_dir", str(outdir)] + list(extra))


def test_experiment_naming():
    from types import SimpleNamespace

    args = SimpleNamespace(
        encoder_name="vilt", cl_algorithm="freeze_bottom_k_layers",
        layers_to_freeze=9, ordered_cl_tasks=["vqa", "nlvr2"],
    )
    assert experiment_name_for(args) == "vilt-freeze_bottom9layers-task0_vqa-task1_nlvr2"
    args.cl_algorithm = "adapter"
    args.adapter_method, args.adapter_config = "vanilla", "houlsby"
    assert experiment_name_for(args) == "vilt-adapter_vanilla_houlsbyconfig-task0_vqa-task1_nlvr2"


def test_singletask_then_sequential_with_eval(tmp_path):
    # singletask baseline first (provides the relative-gain reference)
    run(tmp_path, "--ordered_cl_tasks", "snli-ve", "--cl_algorithm", "singletask_ft", "--do_train")
    single_dir = tmp_path / "vilt-singletask_ft-task0_snli-ve"
    results = json.loads((single_dir / "results.json").read_text())
    assert results[0]["task_key"] == "snli-ve"
    assert (single_dir / "checkpoints" / "task0_snli-ve" / "model").exists()
    assert (single_dir / "checkpoints" / "task0_snli-ve" / "encoder").exists()

    # sequential 2-task with full eval phase
    run(tmp_path, "--ordered_cl_tasks", "snli-ve,nlvr2",
        "--cl_algorithm", "sequential_ft", "--do_train", "--do_eval")
    seq_dir = tmp_path / "vilt-sequential_ft-task0_snli-ve-task1_nlvr2"
    ev = json.loads((seq_dir / "eval_results.json").read_text())
    assert ev["upstream_knowledge_transfer"]["snli-ve"]["relative_gain"] is not None
    assert "snli-ve" in ev["forgetting"]["nlvr2"]
    f = ev["forgetting"]["nlvr2"]["snli-ve"]
    assert f["transfer_tasks"] == "1->0"

    # resume: second invocation must skip both tasks (results unchanged)
    before = (seq_dir / "results.json").read_text()
    run(tmp_path, "--ordered_cl_tasks", "snli-ve,nlvr2",
        "--cl_algorithm", "sequential_ft", "--do_train")
    assert (seq_dir / "results.json").read_text() == before


def test_algorithm_arg_validation(tmp_path):
    with pytest.raises(AssertionError):
        run(tmp_path, "--ordered_cl_tasks", "snli-ve,nlvr2",
            "--cl_algorithm", "singletask_ft", "--do_train")
    with pytest.raises(AssertionError):
        run(tmp_path, "--ordered_cl_tasks", "snli-ve,nlvr2",
            "--cl_algorithm", "experience_replay", "--do_train")  # no memory args


def test_driver_with_mesh(tmp_path):
    """--use_mesh shards the whole driver run over the 8-device CPU mesh
    (DP x TP); results layout identical to the unsharded path."""
    import json

    from climb_tpu.cli.train_upstream_continual_learning import main as upstream_main

    upstream_main([
        "--encoder_name", "vilt",
        "--pretrained_model_name", "scratch",
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--ordered_cl_tasks", "snli-ve",
        "--cl_algorithm", "singletask_ft",
        "--use_mesh", "--n_model", "2",
        "--do_train",
    ])
    out = tmp_path / "vilt-singletask_ft-task0_snli-ve"
    results = json.loads((out / "results.json").read_text())
    assert results[0]["task_key"] == "snli-ve"
    assert (out / "checkpoints" / "task0_snli-ve" / "model").is_file()


def test_corrupt_task_checkpoint_retrains(tmp_path):
    """An unreadable task checkpoint triggers retraining (with a warning),
    not a crash — then the re-saved checkpoint is valid again."""
    import json

    from climb_tpu.ckpt import load_params
    from climb_tpu.cli.train_upstream_continual_learning import main as upstream_main

    base = [
        "--encoder_name", "vilt",
        "--pretrained_model_name", "scratch",
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--ordered_cl_tasks", "snli-ve",
        "--cl_algorithm", "singletask_ft",
        "--do_train",
    ]
    upstream_main(base)
    exp = tmp_path / "vilt-singletask_ft-task0_snli-ve"
    ckpt = exp / "checkpoints" / "task0_snli-ve" / "model"
    ckpt.write_bytes(b"\x01corrupted")
    # cached results would skip the task before the checkpoint is touched;
    # clear them so the resume path exercises the corrupt file
    (exp / "results.json").unlink()

    upstream_main(base)  # must retrain, not crash
    tree = load_params(str(ckpt))
    assert "vilt" in tree
    results = json.loads((exp / "results.json").read_text())
    assert results[0]["task_key"] == "snli-ve"


def test_driver_with_fsdp(tmp_path):
    """--use_mesh --fsdp runs the whole driver with ZeRO-3 param/optimizer
    sharding over the CPU mesh; results layout unchanged."""
    run(tmp_path, "--ordered_cl_tasks", "snli-ve",
        "--cl_algorithm", "singletask_ft",
        "--use_mesh", "--fsdp", "--do_train")
    out = tmp_path / "vilt-singletask_ft-task0_snli-ve"
    results = json.loads((out / "results.json").read_text())
    assert results[0]["task_key"] == "snli-ve"
    assert (out / "checkpoints" / "task0_snli-ve" / "model").is_file()


def test_driver_with_buckets(tmp_path):
    """Aspect + text bucketing through the full driver: train + eval stream
    mixed canvas widths and text lengths through per-bucket jit
    specializations of one model."""
    run(tmp_path, "--ordered_cl_tasks", "snli-ve",
        "--cl_algorithm", "singletask_ft",
        "--aspect_buckets", "auto", "--text_buckets", "auto",
        "--synthetic_train_size", "32", "--do_train")
    out = tmp_path / "vilt-singletask_ft-task0_snli-ve"
    results = json.loads((out / "results.json").read_text())
    assert results[0]["task_key"] == "snli-ve"


def test_driver_with_pp(tmp_path):
    """--pp_stages runs the whole driver (train + eval + checkpoints)
    through the pipeline-parallel encoder on a ('data','pipe') CPU mesh;
    results layout identical to the unsharded path."""
    import json

    run(tmp_path, "--ordered_cl_tasks", "snli-ve",
        "--cl_algorithm", "singletask_ft",
        "--pp_stages", "2", "--do_train", "--do_eval")
    out = tmp_path / "vilt-singletask_ft-task0_snli-ve"
    results = json.loads((out / "results.json").read_text())
    assert results[0]["task_key"] == "snli-ve"
    assert (out / "checkpoints" / "task0_snli-ve" / "model").is_file()
    assert (out / "eval_results.json").exists()
