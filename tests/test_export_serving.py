"""AOT serving artifacts (climb_tpu/serve/export.py): a jax.export-lowered
eval step + trained params in one file must reproduce the live model's
outputs exactly, validate its input signature, and drive the predict CLI
end-to-end without any model build (--export_model / --from_export).

The reference has no serving path at all (evaluation lives inside trainer
loops, train_snli_ve.py:246-266) — this subsystem is beyond-reference."""

import json
import os
from types import SimpleNamespace

import numpy as np
import pytest

import jax

from climb_tpu.configs import task_configs
from climb_tpu.train import LOSS_TYPES, create_cl_model
from climb_tpu.train.train_step import make_eval_step


def tiny_args(**kw):
    base = dict(
        batch_size=4,
        seed=0,
        synthetic=True,
        tiny=True,
        ordered_cl_tasks=["snli-ve"],
        encoder_name="vilt",
        pretrained_vilt_name="scratch",
        image_height=64,
        image_width=96,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def make_batch(cfg, bs=4, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "input_ids": rng.randint(1, cfg.vocab_size, (bs, cfg.max_text_len)).astype(np.int32),
        "text_mask": np.ones((bs, cfg.max_text_len), np.float32),
        "pixel_values": rng.randint(0, 255, (bs, cfg.image_height, cfg.image_width, 3)).astype(np.uint8),
        "patch_hw": np.tile([[cfg.grid_h, cfg.grid_w]], (bs, 1)).astype(np.int32),
        "labels": rng.randint(0, 3, (bs,)).astype(np.int32),
    }


def test_export_roundtrip_logits_match(tmp_path):
    """Deserialize + call must equal the live jitted eval step bit-for-bit
    (same program, same platform, same inputs)."""
    from climb_tpu.serve import ExportedModel, export_eval_step

    args = tiny_args()
    model = create_cl_model(args, task_configs)
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], model.cfg.compute_dtype
    )
    batch = make_batch(model.cfg)
    want_logits, want_s, want_c = eval_step(model.params, batch)

    path = str(tmp_path / "snli-ve.climbx")
    meta = export_eval_step(
        eval_step, model.params, batch, path,
        {"task_key": "snli-ve", "batch_size": 4}, platforms=("tpu", "cpu"),
    )
    assert meta["platforms"] == ["tpu", "cpu"]
    assert set(meta["batch_spec"]) == set(batch)

    served = ExportedModel(path)
    assert served.platforms == ("tpu", "cpu")
    got_logits, got_s, got_c = served(batch)
    np.testing.assert_array_equal(np.asarray(want_logits), np.asarray(got_logits))
    assert float(want_s) == pytest.approx(float(got_s), abs=0)
    assert float(want_c) == float(got_c)


def test_exported_signature_validation(tmp_path):
    from climb_tpu.serve import ExportedModel, export_eval_step

    args = tiny_args()
    model = create_cl_model(args, task_configs)
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], model.cfg.compute_dtype
    )
    batch = make_batch(model.cfg)
    path = str(tmp_path / "art")
    export_eval_step(eval_step, model.params, batch, path, {"task_key": "snli-ve"})
    served = ExportedModel(path)

    # extra keys are dropped silently (loaders attach side fields)
    extra = dict(batch, valid=np.ones((4,), np.float32))
    served(extra)

    # wrong batch size -> actionable error naming the program ladder
    small = {k: v[:2] for k, v in batch.items()}
    with pytest.raises(ValueError, match="ladder"):
        served(small)

    # wrong trailing shape -> error naming the expected signature
    cropped = dict(batch, input_ids=batch["input_ids"][:, :-1])
    with pytest.raises(ValueError, match="input_ids"):
        served(cropped)

    # missing input -> error listing it
    missing = {k: v for k, v in batch.items() if k != "text_mask"}
    with pytest.raises(ValueError, match="text_mask"):
        served(missing)


def test_predict_cli_export_then_serve(tmp_path):
    """End-to-end: train -> predict --export_model -> predict --from_export.
    The served artifact must reproduce the live checkpoint's predictions and
    metric exactly, with no encoder build or checkpoint load at serve time."""
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

    common = [
        "--encoder_name", "vilt",
        "--ordered_cl_tasks", "snli-ve",
        "--task_key", "snli-ve",
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--pretrained_model_name", "scratch",
    ]

    live_out = tmp_path / "live.json"
    predict_main(common + ["--checkpoint", str(ckpt), "--output_file", str(live_out)])

    artifact = tmp_path / "snli-ve.climbx"
    meta = predict_main(common + [
        "--checkpoint", str(ckpt), "--export_model", str(artifact),
    ])
    assert artifact.exists()
    assert meta["task_key"] == "snli-ve"

    served_out = tmp_path / "served.json"
    predict_main(common + [
        "--from_export", str(artifact), "--output_file", str(served_out),
    ])

    live = json.loads(live_out.read_text())
    served = json.loads(served_out.read_text())
    assert served["predictions"] == live["predictions"]
    assert served["metric"] == pytest.approx(live["metric"], abs=1e-9)
    assert served["n_examples"] == live["n_examples"]


def test_export_int8_static_bakes_ptq_scales(tmp_path):
    """An int8_static export must carry its PTQ calibration inside the
    program (extra_vars are closure constants at lowering time): the served
    artifact equals the live int8 eval step, and differs from a bf16 export
    of the same params."""
    from climb_tpu.models import HeadSpec, ViltContinualLearner
    from climb_tpu.models.model_config import ViltConfig
    from climb_tpu.serve import ExportedModel, export_eval_step
    from climb_tpu.train.train_step import calibrate_quant_scales

    cfg = ViltConfig(
        vocab_size=100, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, image_height=64, image_width=96,
        patch_size=32, pretrain_image_size=64,
    )
    cfg_q = cfg.replace(dense_impl="int8_static")
    specs = (HeadSpec("snli-ve", "classification", 3),)
    model_q = ViltContinualLearner(cfg_q, specs)

    def mk_batch(seed):
        r = np.random.RandomState(seed)
        return {
            "input_ids": r.randint(1, 100, (4, cfg.max_text_len)).astype(np.int32),
            "text_mask": np.ones((4, cfg.max_text_len), np.float32),
            "pixel_values": r.randint(0, 255, (4, 64, 96, 3)).astype(np.uint8),
            "patch_hw": np.tile([[cfg.grid_h, cfg.grid_w]], (4, 1)).astype(np.int32),
            "labels": r.randint(0, 3, (4,)).astype(np.int32),
        }

    params = ViltContinualLearner(cfg, specs).init(
        jax.random.PRNGKey(0), mk_batch(0), method=ViltContinualLearner.init_all
    )["params"]
    qcol = calibrate_quant_scales(model_q, "snli-ve", params, [mk_batch(1), mk_batch(2)])

    step_q = make_eval_step(model_q, "snli-ve", "ce", extra_vars={"quant": qcol})
    batch = mk_batch(3)
    want, _, _ = step_q(params, batch)

    path = str(tmp_path / "int8.climbx")
    export_eval_step(step_q, params, batch, path,
                     {"task_key": "snli-ve", "dense_impl": "int8_static"})
    got, _, _ = ExportedModel(path)(batch)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    # sanity: the bf16 program of the same params is a different function
    model_bf = ViltContinualLearner(cfg, specs)
    step_bf = make_eval_step(model_bf, "snli-ve", "ce")
    bf_logits, _, _ = step_bf(params, batch)
    assert not np.array_equal(np.asarray(bf_logits), np.asarray(got))


def test_serving_needs_no_model_code(tmp_path):
    """The artifact is self-contained: a fresh process serves it having
    imported ONLY climb_tpu.serve — no modeling, training, or data modules
    (the 'no model code at serve time' claim in docs/SERVING.md)."""
    import pickle
    import subprocess
    import sys
    import textwrap

    from climb_tpu.serve import export_eval_step

    args = tiny_args()
    model = create_cl_model(args, task_configs)
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], model.cfg.compute_dtype
    )
    batch = make_batch(model.cfg)
    want_logits, _, _ = eval_step(model.params, batch)
    path = str(tmp_path / "art")
    export_eval_step(eval_step, model.params, batch, path, {"task_key": "snli-ve"})
    with open(tmp_path / "batch.pkl", "wb") as f:
        pickle.dump({k: np.asarray(v) for k, v in batch.items()}, f)

    code = textwrap.dedent(f"""
        import os, pickle, sys
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \\
            " --xla_force_host_platform_device_count=1"
        import jax
        jax.config.update("jax_platforms", "cpu")
        import numpy as np
        from climb_tpu.serve import ExportedModel
        m = ExportedModel({str(path)!r})
        with open({str(tmp_path / 'batch.pkl')!r}, "rb") as f:
            batch = pickle.load(f)
        logits, s, c = m(batch)
        loaded = sorted(k for k in sys.modules if k.startswith("climb_tpu"))
        assert loaded == ["climb_tpu", "climb_tpu.serve", "climb_tpu.serve.export"], loaded
        np.save({str(tmp_path / 'logits.npy')!r}, np.asarray(logits))
        print("ok")
    """)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout
    got = np.load(tmp_path / "logits.npy")
    np.testing.assert_array_equal(np.asarray(want_logits), got)


def test_export_viltbert(tmp_path):
    """ViLT-BERT exports too: the frozen BERT text side lives inside the
    params tree, so the (params, batch) signature covers it."""
    from climb_tpu.serve import ExportedModel, export_eval_step

    args = tiny_args(encoder_name="viltbert")
    model = create_cl_model(args, task_configs)
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], model.cfg.compute_dtype
    )
    batch = make_batch(model.cfg)
    want, _, _ = eval_step(model.params, batch)
    path = str(tmp_path / "vb.climbx")
    export_eval_step(eval_step, model.params, batch, path, {"task_key": "snli-ve"})
    got, _, _ = ExportedModel(path)(batch)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_export_batch_size_ladder(tmp_path):
    """A ladder export carries one program per batch size; every program
    computes the same logits as the live eval step on its own row count,
    and pick_batch_size routes to the smallest program that fits."""
    from climb_tpu.serve import ExportedModel, export_eval_step

    args = tiny_args()
    model = create_cl_model(args, task_configs)
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], model.cfg.compute_dtype
    )
    batch = make_batch(model.cfg)  # signature batch = 4
    path = str(tmp_path / "ladder")
    meta = export_eval_step(
        eval_step, model.params, batch, path,
        {"task_key": "snli-ve", "batch_size": 4}, platforms=("cpu",),
        batch_sizes=(1, 2),
    )
    assert meta["batch_sizes"] == [1, 2, 4]

    served = ExportedModel(path)
    assert served.batch_sizes == (1, 2, 4)
    assert served.pick_batch_size(1) == 1
    assert served.pick_batch_size(2) == 2
    assert served.pick_batch_size(3) == 4
    assert served.pick_batch_size(99) == 4

    want = np.asarray(eval_step(model.params, batch)[0])
    for bs in (1, 2, 4):
        sub = {k: v[:bs] for k, v in batch.items()}
        got = np.asarray(served(sub)[0])
        # same lowered program semantics; row values must match the live
        # step's corresponding rows (f32 CPU: exact)
        np.testing.assert_allclose(got, want[:bs], rtol=1e-5, atol=1e-6)

    # a non-ladder batch size still errors actionably
    with pytest.raises(ValueError, match="ladder"):
        served({k: v[:3] for k, v in batch.items()})

    # ladder sizes above the signature batch are rejected at export time
    with pytest.raises(ValueError, match="exceed"):
        export_eval_step(
            eval_step, model.params, batch, str(tmp_path / "bad"),
            {"task_key": "snli-ve"}, platforms=("cpu",), batch_sizes=(8,),
        )


def test_legacy_by_bs_artifact_keeps_its_ladder(tmp_path):
    """Artifacts exported before the width ladder stored batch-size ladder
    programs under 'stablehlo_by_bs' (same format_version): the reader must
    still surface those programs, not silently serve signature-batch only."""
    from flax import serialization

    from climb_tpu.serve import ExportedModel, export_eval_step

    args = tiny_args()
    model = create_cl_model(args, task_configs)
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], model.cfg.compute_dtype
    )
    batch = make_batch(model.cfg)  # signature batch = 4
    path = str(tmp_path / "legacy")
    export_eval_step(
        eval_step, model.params, batch, path,
        {"task_key": "snli-ve", "batch_size": 4}, platforms=("cpu",),
        batch_sizes=(2,),
    )
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    # rewrite to the pre-width-ladder layout: '<bs>:<w>' variants -> bare-bs
    payload["stablehlo_by_bs"] = {
        key.split(":")[0]: blob
        for key, blob in payload.pop("stablehlo_variants").items()
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))

    served = ExportedModel(path)
    assert 2 in served.batch_sizes
    want = np.asarray(eval_step(model.params, batch)[0])
    got = np.asarray(served({k: v[:2] for k, v in batch.items()})[0])
    np.testing.assert_allclose(got, want[:2], rtol=1e-5, atol=1e-6)


def test_http_server_uses_ladder_for_partial_batches(tmp_path):
    """With a ladder artifact, a single-instance request at idle must run
    the bs=1 program (stats.last_batch_size == 1), not pad to the full
    signature batch — and return the same prediction."""
    import urllib.request

    from climb_tpu.serve import export_eval_step
    from climb_tpu.serve.server import create_server

    args = tiny_args()
    model = create_cl_model(args, task_configs)
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], model.cfg.compute_dtype
    )
    batch = make_batch(model.cfg)
    cfg = model.cfg
    meta = {
        "task_key": "snli-ve", "loss_type": "ce",
        "model_type": "classification", "num_labels": 3, "num_images": 1,
        "num_choices": 0, "batch_size": 4,
        "hidden_size": cfg.hidden_size, "max_text_len": cfg.max_text_len,
        "image_height": cfg.image_height, "image_width": cfg.image_width,
        "patch_size": cfg.patch_size, "compute_dtype": str(cfg.compute_dtype),
        "encoder_name": "vilt", "dense_impl": "xla", "tokenizer": "synthetic",
    }
    path = str(tmp_path / "ladder_http")
    export_eval_step(eval_step, model.params, batch, path, meta,
                     platforms=("cpu",), batch_sizes=(1, 2))

    server = create_server(path, port=0, max_wait_ms=1.0)
    try:
        import threading

        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        host, port = server.server_address[:2]
        rng = np.random.RandomState(7)
        inst = {"text": "a tiny test sentence",
                "image": rng.randint(0, 255, (48, 64, 3)).tolist()}
        req = urllib.request.Request(
            f"http://{host}:{port}/v1/predict",
            data=json.dumps({"instances": [inst]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["n"] == 1 and len(out["predictions"]) == 1

        with urllib.request.urlopen(
            f"http://{host}:{port}/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())
        assert stats["last_batch_size"] == 1
    finally:
        server.shutdown()
        server.service.close()


def test_export_canvas_width_ladder(tmp_path):
    """A width-ladder export routes by pixel canvas width; cropping the
    canvas to any ladder width covering the valid patches must not change
    the logits (padding patches are masked out of attention either way)."""
    from climb_tpu.serve import ExportedModel, export_eval_step

    args = tiny_args()
    model = create_cl_model(args, task_configs)
    cfg = model.cfg  # canvas 64x96, patch 32 -> grid 2x3
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], cfg.compute_dtype
    )
    batch = make_batch(model.cfg)
    # every image only occupies the first 32-pixel column of patches
    batch["patch_hw"] = np.tile([[2, 1]], (4, 1)).astype(np.int32)

    path = str(tmp_path / "wladder")
    meta = export_eval_step(
        eval_step, model.params, batch, path,
        {"task_key": "snli-ve", "patch_size": 32}, platforms=("cpu",),
        batch_sizes=(1,), canvas_widths=(32, 64),
    )
    assert meta["canvas_widths"] == [32, 64, 96]

    served = ExportedModel(path)
    assert served.canvas_widths == (32, 64, 96)
    assert served.pick_canvas_width(20) == 32
    assert served.pick_canvas_width(40) == 64
    assert served.pick_canvas_width(96) == 96
    assert served.pick_canvas_width(1000) == 96

    want = np.asarray(served(batch)[0])  # full canvas program
    for w in (32, 64):
        cropped = dict(batch, pixel_values=batch["pixel_values"][:, :, :w])
        got = np.asarray(served(cropped)[0])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        # and at bs=1 x width (the cross-product variant)
        one = {k: v[:1] for k, v in cropped.items()}
        got1 = np.asarray(served(one)[0])
        np.testing.assert_allclose(got1, want[:1], rtol=1e-5, atol=1e-6)

    # a non-ladder width errors actionably
    with pytest.raises(ValueError, match="pixel_values"):
        served(dict(batch, pixel_values=batch["pixel_values"][:, :, :48]))

    # non-patch-multiple / too-wide ladder widths are rejected at export
    with pytest.raises(ValueError, match="patch-size"):
        export_eval_step(
            eval_step, model.params, batch, str(tmp_path / "bad"),
            {"task_key": "snli-ve", "patch_size": 32}, platforms=("cpu",),
            canvas_widths=(48,),
        )


def test_http_server_uses_width_ladder(tmp_path):
    """A request whose image needs only a narrow canvas must run a narrow
    program (stats.last_batch_width < signature width) and produce the same
    prediction as the full-canvas artifact."""
    import threading
    import urllib.request

    from climb_tpu.serve import export_eval_step
    from climb_tpu.serve.server import create_server

    args = tiny_args()
    model = create_cl_model(args, task_configs)
    cfg = model.cfg
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], cfg.compute_dtype
    )
    batch = make_batch(model.cfg)
    meta = {
        "task_key": "snli-ve", "loss_type": "ce",
        "model_type": "classification", "num_labels": 3, "num_images": 1,
        "num_choices": 0, "batch_size": 4,
        "hidden_size": cfg.hidden_size, "max_text_len": cfg.max_text_len,
        "image_height": cfg.image_height, "image_width": cfg.image_width,
        "patch_size": cfg.patch_size, "compute_dtype": str(cfg.compute_dtype),
        "encoder_name": "vilt", "dense_impl": "xla", "tokenizer": "synthetic",
    }

    def serve_and_predict(path, inst):
        server = create_server(path, port=0, max_wait_ms=1.0)
        try:
            t = threading.Thread(target=server.serve_forever, daemon=True)
            t.start()
            host, port = server.server_address[:2]
            req = urllib.request.Request(
                f"http://{host}:{port}/v1/predict",
                data=json.dumps({"instances": [inst],
                                 "return_logits": True}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                out = json.loads(r.read())
            with urllib.request.urlopen(
                f"http://{host}:{port}/stats", timeout=30
            ) as r:
                stats = json.loads(r.read())
            return out, stats
        finally:
            server.shutdown()
            server.service.close()

    rng = np.random.RandomState(3)
    # square 64x64 image -> resizes to 64x64 on the 64-high canvas ->
    # 2x2 valid patches -> needs only a 64-wide canvas (not the 96 signature)
    inst = {"text": "a square image",
            "image": rng.randint(0, 255, (64, 64, 3)).tolist()}

    ladder_path = str(tmp_path / "ladder_w")
    export_eval_step(eval_step, model.params, batch, ladder_path, meta,
                     platforms=("cpu",), batch_sizes=(1,),
                     canvas_widths=(64,))
    out_l, stats_l = serve_and_predict(ladder_path, inst)
    assert stats_l["last_batch_width"] == 64
    assert stats_l["last_batch_size"] == 1

    plain_path = str(tmp_path / "plain_w")
    export_eval_step(eval_step, model.params, batch, plain_path, meta,
                     platforms=("cpu",))
    out_p, stats_p = serve_and_predict(plain_path, inst)
    assert stats_p["last_batch_width"] == cfg.image_width

    assert out_l["predictions"] == out_p["predictions"]
    np.testing.assert_allclose(out_l["logits"], out_p["logits"],
                               rtol=1e-5, atol=1e-6)


def test_predict_from_export_dataset_mode_uses_width_ladder(tmp_path):
    """--from_export with a width-ladder artifact serves the dataset split
    through loader-side aspect bucketing (batches route to per-width
    programs) and must reproduce the plain artifact's predictions/metric
    exactly."""
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

    common = [
        "--encoder_name", "vilt",
        "--ordered_cl_tasks", "snli-ve",
        "--task_key", "snli-ve",
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--pretrained_model_name", "scratch",
    ]

    plain_art = tmp_path / "plain.climbx"
    predict_main(common + ["--checkpoint", str(ckpt),
                           "--export_model", str(plain_art)])
    plain_out = tmp_path / "plain.json"
    predict_main(common + ["--from_export", str(plain_art),
                           "--output_file", str(plain_out)])

    ladder_art = tmp_path / "ladder.climbx"
    predict_main(common + ["--checkpoint", str(ckpt),
                           "--export_model", str(ladder_art),
                           "--export_canvas_widths", "32,64"])
    ladder_out = tmp_path / "ladder.json"
    predict_main(common + ["--from_export", str(ladder_art),
                           "--output_file", str(ladder_out)])

    plain = json.loads(plain_out.read_text())
    ladder = json.loads(ladder_out.read_text())
    assert ladder["predictions"] == plain["predictions"]
    assert ladder["metric"] == pytest.approx(plain["metric"], abs=1e-4)
    assert ladder["n_examples"] == plain["n_examples"]
