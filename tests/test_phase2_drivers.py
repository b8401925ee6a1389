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


def test_language_driver_max_len_override_long_text(tmp_path):
    """--max_len_override enters the reallocate_text_image long-text regime
    from the CLI: text position slots tile to a multiple of 40 and the image
    shrinks to 128x128 (reference train_language.py:80-84). This is the
    driver path the long-sequence Pallas kernels serve in production
    (exp_scripts/bench_longseq_language.py measures the hardware A/B)."""
    from climb_tpu.cli.train_language import main as lang_main

    lang_main([
        "--encoder_name", "vilt",
        "--checkpoint_name", "scratch",
        "--task_name", "sst2",
        "--climb_data_dir", "/tmp/unused",
        "--output_dir", str(tmp_path),
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--num_shot", "16", "--subsample_seed", "10",
        "--max_len_override", "80",  # > 40 -> reallocated
    ])
    files = list(tmp_path.glob("*_results.json"))
    assert len(files) == 1
    entry = json.loads(files[0].read_text())["nshot-16"]["seed-10"]
    assert len(entry) == 3


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


def test_predict_cli_from_checkpoint(tmp_path):
    """The inference driver loads a Phase I checkpoint and produces
    per-example predictions + the task metric + throughput."""
    from climb_tpu.cli.predict import main as predict_main
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
    ]
    upstream_main(base + ["--do_train"])
    ckpt = (tmp_path / "vilt-singletask_ft-task0_snli-ve" / "checkpoints"
            / "task0_snli-ve" / "model")

    out_file = tmp_path / "preds.json"
    result = predict_main([
        "--encoder_name", "vilt",
        "--ordered_cl_tasks", "snli-ve",
        "--task_key", "snli-ve",
        "--checkpoint", str(ckpt),
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--pretrained_model_name", "scratch",
        "--output_file", str(out_file),
    ])
    saved = json.loads(out_file.read_text())
    assert saved["n_examples"] == len(saved["predictions"]) > 0
    assert 0.0 <= saved["metric"] <= 100.0
    assert all(p in (0, 1, 2) for p in saved["predictions"])  # 3-way snli-ve
    assert result["metric"] == saved["metric"]


def test_language_driver_viltbert_frozen_bert(tmp_path, monkeypatch):
    """--encoder_name viltbert builds the frozen-BERT classifier (reference
    lang/viltbert-seq.sh -> ViltBertForSequenceClassification,
    viltbert.py:380): BERT params must not move during training while the
    ViLT side does."""
    import numpy as np

    from climb_tpu.cli import train_language as tl
    from climb_tpu.train import downstream

    captured = {}
    orig = downstream.train_downstream

    def spy(args, module, params, *a, **kw):
        import jax

        # snapshot to host: the jitted step donates the state, deleting
        # the original param buffers
        captured["before"] = jax.tree_util.tree_map(
            lambda x: np.array(x), params
        )
        out = orig(args, module, params, *a, **kw)
        captured["after"] = out[3]
        return out

    # the driver imports train_downstream lazily from this module
    monkeypatch.setattr(downstream, "train_downstream", spy)
    tl.main([
        "--encoder_name", "viltbert",
        "--checkpoint_name", "scratch",
        "--task_name", "sst2",
        "--climb_data_dir", "/tmp/unused",
        "--output_dir", str(tmp_path),
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--num_shot", "16", "--subsample_seed", "10",
    ])
    before, after = captured["before"], captured["after"]
    assert "viltbert" in before and "bert" in before["viltbert"]

    def total_delta(a, b):
        import jax

        return sum(
            float(np.abs(np.asarray(x) - np.asarray(y)).sum())
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    assert total_delta(before["viltbert"]["bert"], after["viltbert"]["bert"]) == 0.0
    assert total_delta(before["viltbert"]["vilt"], after["viltbert"]["vilt"]) > 0.0


def test_load_encoder_params_viltbert_layouts(tmp_path):
    """viltbert encoder loading accepts our {'vilt','bert'} encoder exports
    and bare ViLT-core checkpoints (vilt side grafted, BERT kept)."""
    import numpy as np

    from climb_tpu.ckpt import save_params
    from climb_tpu.models.model_config import ViltConfig
    from climb_tpu.train.model_factory import load_encoder_params

    cfg = ViltConfig(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, image_height=64, image_width=96,
        patch_size=32, pretrain_image_size=64,
    )
    params, _ = load_encoder_params(None, cfg, pretrained="scratch",
                                    encoder_name="viltbert")
    assert set(params) == {"vilt", "bert"}

    # perturb + save in our encoder layout, reload
    params["vilt"]["word_embeddings"] = params["vilt"]["word_embeddings"] + 1.0
    p = str(tmp_path / "encoder")
    save_params(params, p)
    loaded, _ = load_encoder_params(p, cfg, pretrained="scratch",
                                    encoder_name="viltbert")
    np.testing.assert_allclose(
        np.asarray(loaded["vilt"]["word_embeddings"]),
        np.asarray(params["vilt"]["word_embeddings"]),
    )


def test_predict_cli_adapter_checkpoint(tmp_path):
    """predict rebuilds adapter modules and activates the task's adapter for
    adapter-trained checkpoints: every checkpoint tensor (incl. adapters)
    must land in the rebuilt model."""
    from climb_tpu.cli.predict import main as predict_main
    from climb_tpu.cli.train_upstream_continual_learning import main as upstream_main

    common = [
        "--encoder_name", "vilt",
        "--pretrained_model_name", "scratch",
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--ordered_cl_tasks", "snli-ve,nlvr2",
    ]
    adapter = [
        "--cl_algorithm", "adapter",
        "--adapter_method", "vanilla",
        "--adapter_config", "pfeiffer",
        "--adapter_reduction_factor", "4",
    ]
    upstream_main(common + adapter + ["--do_train"])
    exp = next(tmp_path.glob("vilt-adapter*"))
    ckpt = exp / "checkpoints" / "task0_snli-ve" / "model"

    out_file = tmp_path / "preds.json"
    result = predict_main(common + adapter + [
        "--task_key", "snli-ve",
        "--checkpoint", str(ckpt),
        "--output_file", str(out_file),
    ])
    assert 0.0 <= result["metric"] <= 100.0
    assert len(result["predictions"]) == result["n_examples"]


def test_predict_from_raw_jsonl(tmp_path):
    """Serving mode: raw {"text", "image"} JSONL through the AOT processor,
    no dataset directory needed."""
    import numpy as np
    from PIL import Image

    from climb_tpu.cli.predict import main as predict_main
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
    ]
    upstream_main(base + ["--do_train"])
    ckpt = (tmp_path / "vilt-singletask_ft-task0_snli-ve" / "checkpoints"
            / "task0_snli-ve" / "model")

    rng = np.random.RandomState(0)
    rows = []
    for i in range(5):  # odd count: exercises the padded final batch
        p = tmp_path / f"img{i}.png"
        Image.fromarray(rng.randint(0, 255, (48, 72, 3), dtype=np.uint8)).save(p)
        rows.append({"text": f"a photo number {i}", "image": str(p), "label": i % 3})
    jl = tmp_path / "inputs.jsonl"
    jl.write_text("\n".join(json.dumps(r) for r in rows))

    out_file = tmp_path / "preds.json"
    result = predict_main(base + [
        "--task_key", "snli-ve",
        "--checkpoint", str(ckpt),
        "--input_jsonl", str(jl),
        "--output_file", str(out_file),
    ])
    assert result["n_examples"] == 5
    assert len(result["predictions"]) == 5
    assert all(p in (0, 1, 2) for p in result["predictions"])
    assert result["metric"] is not None  # labels present

    # without labels the metric is None but predictions still come back
    jl2 = tmp_path / "inputs2.jsonl"
    jl2.write_text("\n".join(json.dumps({k: v for k, v in r.items() if k != "label"}) for r in rows))
    result2 = predict_main(base + [
        "--task_key", "snli-ve",
        "--checkpoint", str(ckpt),
        "--input_jsonl", str(jl2),
        "--output_file", str(tmp_path / "preds2.json"),
    ])
    assert result2["metric"] is None
    assert result2["predictions"] == result["predictions"]


def test_predict_cli_use_mesh_matches_single_device(tmp_path):
    """--use_mesh serves data-parallel over the 8-device CPU mesh with the
    same predictions and metric as the single-device path."""
    import json as _json

    from climb_tpu.cli.predict import main as predict_main
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
    ]
    upstream_main(base + ["--do_train"])
    ckpt = str(tmp_path / "vilt-singletask_ft-task0_snli-ve" / "checkpoints"
               / "task0_snli-ve" / "model")
    common = [
        "--encoder_name", "vilt",
        "--ordered_cl_tasks", "snli-ve",
        "--task_key", "snli-ve",
        "--checkpoint", ckpt,
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--pretrained_model_name", "scratch",
    ]
    single_out = tmp_path / "single.json"
    predict_main(common + ["--output_file", str(single_out)])
    mesh_out = tmp_path / "mesh.json"
    predict_main(common + ["--use_mesh", "--output_file", str(mesh_out)])

    single = _json.loads(single_out.read_text())
    meshed = _json.loads(mesh_out.read_text())
    assert meshed["predictions"] == single["predictions"]
    assert meshed["metric"] == pytest.approx(single["metric"], abs=1e-5)
