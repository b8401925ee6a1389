"""End-to-end Phase II driver runs (in-process, synthetic tiny): low-shot
multimodal transfer, language-only transfer, vision-only transfer — the
reference's three downstream entry points (SURVEY.md sections 3.3-3.5)."""

import json

import pytest


def test_lowshot_multimodal_from_upstream_checkpoints(tmp_path):
    from climb_tpu.cli.train_lowshot_multimodal import main as lowshot_main
    from climb_tpu.cli.train_upstream_continual_learning import main as upstream_main

    base = [
        "--encoder_name", "vilt",
        "--pretrained_model_name", "scratch",
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--ordered_cl_tasks", "snli-ve,nlvr2",
        "--cl_algorithm", "sequential_ft",
    ]
    upstream_main(base + ["--do_train"])
    lowshot_main(base)

    out = tmp_path / "vilt-sequential_ft-task0_snli-ve-task1_nlvr2"
    results = json.loads((out / "lowshot_results.json").read_text())
    # snli-ve checkpoint transfers to every later task (here: nlvr2)
    assert results[0]["upstream_task_key"] == "snli-ve"
    assert results[0]["lowshot_task_key"] == "nlvr2"
    assert "best_low_shot_score" in results[0]
    assert results[0]["low_shot_config"]["num_shots_per_class"] == 2048


@pytest.mark.parametrize("task,model_catog", [("sst2", "vilt-l-seq"), ("piqa", "vilt-l-mc")])
def test_language_driver_seq_and_mc(tmp_path, task, model_catog):
    from climb_tpu.cli.train_language import main as lang_main

    lang_main([
        "--encoder_name", "vilt",
        "--checkpoint_name", "scratch",
        "--task_name", task,
        "--model_catog", model_catog,
        "--climb_data_dir", "/tmp/unused",
        "--output_dir", str(tmp_path),
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--num_shot", "16", "--subsample_seed", "10",
    ])
    files = list(tmp_path.glob("*_results.json"))
    assert len(files) == 1
    scores = json.loads(files[0].read_text())
    entry = scores["nshot-16"]["seed-10"]
    assert len(entry) == 3  # (test, dev, best_epoch)


@pytest.mark.parametrize("task", ["imagenet", "coco-cls"])
def test_vision_driver_acc_and_microf1(tmp_path, task):
    from climb_tpu.cli.train_vision import main as vision_main

    argv = [
        "--encoder_name", "vilt",
        "--checkpoint_name", "scratch",
        "--task_name", task,
        "--climb_data_dir", "/tmp/unused",
        "--output_dir", str(tmp_path),
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--subsample_seed", "10",
    ]
    # num_shot is per-class for CE tasks, a percentage for coco-cls
    argv += ["--num_shot", "10" if task == "coco-cls" else "16"]
    vision_main(argv)
    files = list(tmp_path.glob("*_results.json"))
    assert len(files) == 1
