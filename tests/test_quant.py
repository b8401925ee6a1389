"""Int8 serving-path numerics (ops/quant.py + ViltConfig.dense_impl).

The int8 path must (a) be exact where quantization is exact, (b) track the
f32 dense within the expected quantization error on real-scale inputs,
(c) leave the TRAINING path untouched (deterministic=False falls back to
nn.Dense bit-for-bit), and (d) keep the param pytree identical so every
checkpoint loader works unchanged."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.models.model_config import ViltConfig
from climb_tpu.models.vilt_core import ViltBlock
from climb_tpu.ops.attention import mask_to_bias
from climb_tpu.ops.quant import int8_dense, quantize_per_channel, quantize_per_row

pytestmark = pytest.mark.smoke


def test_int8_dense_exact_on_exact_grid():
    # per-col/row maxabs of 127 makes the quant scales exactly 1 -> integer
    # weights/activations are represented exactly and the matmul is exact
    w = np.arange(-8, 8, dtype=np.float32).reshape(4, 4)
    w[0, :] = 127.0
    w = jnp.asarray(w)
    a = jnp.asarray(np.array([[127.0, -2.0, 3.0, -4.0]], np.float32))
    b = jnp.asarray(np.array([0.5, -0.5, 0.0, 1.0], np.float32))
    got = int8_dense(a, w, b)
    want = a @ w + b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_int8_dense_tracks_f32_within_quant_error(rng):
    a = jnp.asarray(rng.randn(6, 37, 64).astype(np.float32))
    w = jnp.asarray((rng.randn(64, 48) * 0.05).astype(np.float32))
    b = jnp.asarray((rng.randn(48) * 0.1).astype(np.float32))
    got = np.asarray(int8_dense(a, w, b))
    want = np.asarray(a @ w + b)
    # per-element error bound: both roundings are <= 1/254 of the row/col
    # max-abs; relative error on the matmul accumulates ~sqrt(D)/127
    err = np.abs(got - want)
    scale = np.abs(want).max()
    assert err.max() / scale < 0.05
    # and the two must be highly correlated
    cc = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert cc > 0.999


def test_quantizers_round_trip(rng):
    w = jnp.asarray((rng.randn(32, 16) * 0.3).astype(np.float32))
    wq, sw = quantize_per_channel(w)
    assert wq.dtype == jnp.int8
    back = np.asarray(wq, np.float32) * np.asarray(sw)
    np.testing.assert_allclose(back, np.asarray(w), atol=np.asarray(sw).max())

    a = jnp.asarray((rng.randn(5, 32) * 2.0).astype(np.float32))
    aq, sa = quantize_per_row(a)
    back = np.asarray(aq, np.float32) * np.asarray(sa)[:, None]
    np.testing.assert_allclose(back, np.asarray(a), atol=np.asarray(sa).max())


@pytest.fixture
def tiny_cfg():
    return ViltConfig(
        vocab_size=100, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, image_height=64, image_width=96,
        patch_size=32, pretrain_image_size=64,
    )


def test_int8_block_param_layout_identical(tiny_cfg, rng):
    x = jnp.asarray(rng.randn(2, 12, 64).astype(np.float32))
    bias = mask_to_bias(jnp.ones((2, 12), jnp.float32))
    p_xla = ViltBlock(tiny_cfg).init(jax.random.PRNGKey(0), x, bias)["params"]
    p_int8 = ViltBlock(tiny_cfg.replace(dense_impl="int8")).init(
        jax.random.PRNGKey(0), x, bias
    )["params"]
    assert jax.tree_util.tree_structure(p_xla) == jax.tree_util.tree_structure(p_int8)
    for (ka, va), (kb, vb) in zip(
        jax.tree_util.tree_leaves_with_path(p_xla),
        jax.tree_util.tree_leaves_with_path(p_int8),
    ):
        assert va.shape == vb.shape, jax.tree_util.keystr(ka)


def test_int8_block_close_to_f32_and_training_path_untouched(tiny_cfg, rng):
    x = jnp.asarray(rng.randn(2, 12, 64).astype(np.float32))
    bias = mask_to_bias(jnp.ones((2, 12), jnp.float32))
    params = ViltBlock(tiny_cfg).init(jax.random.PRNGKey(0), x, bias)["params"]

    out_f32, _ = ViltBlock(tiny_cfg, deterministic=True).apply(
        {"params": params}, x, bias
    )
    out_int8, _ = ViltBlock(
        tiny_cfg.replace(dense_impl="int8"), deterministic=True
    ).apply({"params": params}, x, bias)
    # residual stream keeps values close; quant noise stays small
    err = np.abs(np.asarray(out_int8) - np.asarray(out_f32))
    assert err.max() / np.abs(np.asarray(out_f32)).max() < 0.08

    # deterministic=False (training): int8 config must be a bit-exact no-op
    out_train_a, _ = ViltBlock(tiny_cfg, deterministic=False).apply(
        {"params": params}, x, bias, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    out_train_b, _ = ViltBlock(
        tiny_cfg.replace(dense_impl="int8"), deterministic=False
    ).apply({"params": params}, x, bias, rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(out_train_a), np.asarray(out_train_b))


def test_int8_full_model_argmax_agreement(tiny_cfg, rng):
    """End-to-end: the int8 encoder forward must produce (near-)identical
    classifications to the f32 forward on a random-init tiny model."""
    from climb_tpu.models import HeadSpec, ViltContinualLearner

    specs = (HeadSpec("snli-ve", "classification", 3),)
    model = ViltContinualLearner(tiny_cfg, specs)
    model_q = ViltContinualLearner(tiny_cfg.replace(dense_impl="int8"), specs)
    B = 8
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 100, (B, 8)), jnp.int32),
        "text_mask": jnp.ones((B, 8), jnp.float32),
        "pixel_values": jnp.asarray(rng.rand(B, 64, 96, 3), jnp.float32),
        "patch_hw": jnp.full((B, 2), 2, jnp.int32),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch, method=ViltContinualLearner.init_all
    )
    logits = model.apply(params, "snli-ve", batch)
    logits_q = model_q.apply(params, "snli-ve", batch)
    agree = (np.argmax(np.asarray(logits), -1) == np.argmax(np.asarray(logits_q), -1))
    assert agree.mean() >= 0.75  # random-init logits are near-degenerate;
    #                              trained-margin agreement is far higher
    # and the logits themselves stay correlated
    cc = np.corrcoef(np.asarray(logits).ravel(), np.asarray(logits_q).ravel())[0, 1]
    assert cc > 0.98


def test_int8_bert_core(rng):
    """The frozen BERT text side honors dense_impl='int8' too (ViLT-BERT
    serving); layout identical, outputs correlated, training path exact."""
    import dataclasses

    from climb_tpu.models.bert import BertConfig, BertCore

    cfg = BertConfig(vocab_size=120, hidden_size=64, num_layers=2, num_heads=4,
                     intermediate_size=128)
    cfg_q = dataclasses.replace(cfg, dense_impl="int8")
    ids = jnp.asarray(rng.randint(1, 120, (2, 10)), jnp.int32)
    mask = jnp.ones((2, 10), jnp.float32)
    p = BertCore(cfg).init(jax.random.PRNGKey(0), ids, mask)["params"]
    p_q = BertCore(cfg_q).init(jax.random.PRNGKey(0), ids, mask)["params"]
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(p_q)

    out = np.asarray(BertCore(cfg).apply({"params": p}, ids, mask))
    out_q = np.asarray(BertCore(cfg_q).apply({"params": p}, ids, mask))
    assert np.corrcoef(out.ravel(), out_q.ravel())[0, 1] > 0.98

    out_tr = BertCore(cfg).apply(
        {"params": p}, ids, mask, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)})
    out_tr_q = BertCore(cfg_q).apply(
        {"params": p}, ids, mask, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_array_equal(np.asarray(out_tr), np.asarray(out_tr_q))


def test_int8_static_dense_matches_dynamic_given_row_amax(rng):
    from climb_tpu.ops.quant import int8_dense_static

    a = jnp.asarray((rng.randn(4, 16) * 0.7).astype(np.float32))
    w = jnp.asarray((rng.randn(16, 8) * 0.05).astype(np.float32))
    b = jnp.asarray((rng.randn(8) * 0.1).astype(np.float32))
    amax = jnp.max(jnp.abs(a))
    got = np.asarray(int8_dense_static(a, w, b, amax))
    want = np.asarray(a @ w + b)
    assert np.abs(got - want).max() / np.abs(want).max() < 0.05


def test_int8_static_calibrate_then_serve(tiny_cfg, rng):
    """Full PTQ flow on the CL model: calibration batches populate the
    'quant' collection (with the scan layer axis), and the static-int8
    serving forward tracks the bf16 forward."""
    from climb_tpu.models import HeadSpec, ViltContinualLearner
    from climb_tpu.train.train_step import calibrate_quant_scales, make_eval_step

    cfg_q = tiny_cfg.replace(dense_impl="int8_static")
    specs = (HeadSpec("snli-ve", "classification", 3),)
    model = ViltContinualLearner(tiny_cfg, specs)
    model_q = ViltContinualLearner(cfg_q, specs)

    def mk_batch(seed):
        r = np.random.RandomState(seed)
        B = 4
        return {
            "input_ids": jnp.asarray(r.randint(1, 100, (B, 8)), jnp.int32),
            "text_mask": jnp.ones((B, 8), jnp.float32),
            "pixel_values": jnp.asarray(r.rand(B, 64, 96, 3), jnp.float32),
            "patch_hw": jnp.full((B, 2), 2, jnp.int32),
            "labels": jnp.asarray(r.randint(0, 3, (B,)), jnp.int32),
        }

    variables = model.init(
        jax.random.PRNGKey(0), mk_batch(0), method=ViltContinualLearner.init_all
    )
    params = variables["params"]

    qcol = calibrate_quant_scales(
        model_q, "snli-ve", params, [mk_batch(1), mk_batch(2)]
    )
    leaves = jax.tree_util.tree_leaves(qcol)
    assert leaves and all(float(jnp.min(l)) > 0 for l in leaves)
    # scan-stacked blocks: per-layer amax leaves carry the layer axis
    assert any(l.shape[:1] == (tiny_cfg.num_layers,) for l in leaves)

    step_bf = make_eval_step(model, "snli-ve", "ce")
    step_q = make_eval_step(model_q, "snli-ve", "ce", extra_vars={"quant": qcol})
    batch = mk_batch(3)
    logits, _, _ = step_bf(params, batch)
    logits_q, _, _ = step_q(params, batch)
    cc = np.corrcoef(np.asarray(logits).ravel(), np.asarray(logits_q).ravel())[0, 1]
    assert cc > 0.98


def test_int8_static_training_run_eval_does_not_crash(tmp_path):
    """--dense_impl int8_static on a TRAINING driver: train steps are xla
    (non-deterministic forward), and the per-epoch eval — which has no PTQ
    calibration — must fall back to dynamic int8 instead of dying on the
    missing 'quant' collection (ops/quant.py::module_int8_dense)."""
    from climb_tpu.cli.train_upstream_continual_learning import main as upstream_main

    result_dir = upstream_main([
        "--encoder_name", "vilt",
        "--pretrained_model_name", "scratch",
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--ordered_cl_tasks", "snli-ve",
        "--cl_algorithm", "singletask_ft",
        "--dense_impl", "int8_static",
        "--do_train",
    ])
    import os
    assert os.path.exists(
        os.path.join(str(tmp_path), "vilt-singletask_ft-task0_snli-ve",
                     "results.json")
    )
