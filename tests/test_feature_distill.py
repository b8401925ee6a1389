"""Feature distillation (cl/distill.py — beyond-reference CL algorithm).

- forward_with_features returns the same logits as the plain forward for all
  three batch layouts (single / pair / multi-choice) plus per-example
  features of the right shape.
- The penalty anchors the student's encoder features on the teacher's:
  training task B with distillation keeps the representation measurably
  closer to the end-of-task-A teacher than plain sequential training.
- Driver end-to-end: --cl_algorithm feature_distill over two tasks.
"""

import json
import os
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.configs import task_configs
from climb_tpu.train import create_cl_model, get_task_trainer_class


def _args(**kw):
    base = dict(
        batch_size=8, seed=3, synthetic=True, synthetic_train_size=24, tiny=True,
        num_workers=2, replay_frequency=100,
        ordered_cl_tasks=["snli-ve", "nlvr2", "vcr"], encoder_name="vilt",
        pretrained_model_name="scratch", image_height=64, image_width=96,
        distill_loss_weight=100.0,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def _batch_for(trainer):
    return next(iter(trainer.train_dataloader))


def test_forward_with_features_matches_plain_forward():
    args = _args()
    model = create_cl_model(args, task_configs)
    b = 8
    for task_key in ("snli-ve", "nlvr2", "vcr"):
        trainer = get_task_trainer_class(task_key)(args, task_configs, {})
        batch = trainer._put(_batch_for(trainer), None)
        plain = model.module.apply({"params": model.params}, task_key, batch)
        logits, feats = model.module.apply(
            {"params": model.params}, task_key, batch,
            method="forward_with_features",
        )
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(logits))
        assert feats.shape[0] == plain.shape[0]
        assert feats.ndim == 2
        d = model.cfg.hidden_size
        spec = next(s for s in model.head_specs if s.task_key == task_key)
        want_k = d * (spec.num_choices if spec.model_type == "multi-choice"
                      else spec.num_images)
        assert feats.shape[1] == want_k, (task_key, feats.shape)


def _feat_dist(model_mod, params_a, params_b, task_key, batch):
    fa = model_mod.apply({"params": params_a}, task_key, batch,
                         method="forward_with_features")[1]
    fb = model_mod.apply({"params": params_b}, task_key, batch,
                         method="forward_with_features")[1]
    return float(((np.asarray(fa, np.float32) - np.asarray(fb, np.float32)) ** 2).mean())


def test_distill_limits_representation_drift():
    from climb_tpu.cl import FeatureDistill

    args = _args()
    model = create_cl_model(args, task_configs)

    # task A: short training on snli-ve -> teacher
    trainer_a = get_task_trainer_class("snli-ve")(args, task_configs, {})
    trainer_a.num_epochs = 2
    trainer_a.lr = 3e-4
    trainer_a.max_steps = len(trainer_a.train_dataloader) * 2
    _, model = trainer_a.train(model)
    teacher_params = jax.device_get(model.params)

    distill = FeatureDistill(args)
    distill.save_teacher("snli-ve", model.params)
    assert distill.has_teacher()

    probe_trainer = get_task_trainer_class("nlvr2")(args, task_configs, {})
    probe = probe_trainer._put(_batch_for(probe_trainer), None)

    def train_b(use_fd):
        m = model.with_params(jax.tree_util.tree_map(jnp.array, model.params))
        trainer_b = get_task_trainer_class("nlvr2")(args, task_configs, {})
        trainer_b.num_epochs = 2
        trainer_b.lr = 3e-4
        trainer_b.max_steps = len(trainer_b.train_dataloader) * 2
        _, m = trainer_b.train(m, distill=distill if use_fd else None)
        return _feat_dist(m.module, m.params, teacher_params, "nlvr2", probe)

    drift_plain = train_b(False)
    drift_fd = train_b(True)
    assert drift_fd < drift_plain, (drift_fd, drift_plain)


def test_train_step_reports_distill_loss():
    from climb_tpu.cl import FeatureDistill
    from climb_tpu.train import TrainState
    from climb_tpu.train.optimizer import make_optimizer
    from climb_tpu.train.train_step import make_train_step

    args = _args()
    model = create_cl_model(args, task_configs)
    distill = FeatureDistill(args)
    distill.save_teacher("snli-ve", model.params)

    trainer = get_task_trainer_class("snli-ve")(args, task_configs, {})
    batch = trainer._put(_batch_for(trainer), None)
    tx = make_optimizer(model.params, lr=1e-4, total_steps=10, warmup_ratio=0)
    state = TrainState.create(apply_fn=model.module.apply, params=model.params, tx=tx)
    step = make_train_step(model.module, "snli-ve", "ce", model.cfg.compute_dtype)

    # teacher == student at step 0 -> zero penalty; after one update the
    # student has moved, so the penalty becomes positive
    state, metrics = step(state, batch, jax.random.PRNGKey(0), None, distill.ref())
    assert float(metrics["distill_loss"]) == pytest.approx(0.0, abs=1e-12)
    state, metrics = step(state, batch, jax.random.PRNGKey(1), None, distill.ref())
    assert float(metrics["distill_loss"]) > 0.0
    assert np.isfinite(float(metrics["loss"]))

    # grad-accum path agrees with the whole-batch step on the penalty value
    # (the jitted steps donate their state, so each call gets a fresh one)
    snapshot = jax.device_get(state.params)

    def mk_state():
        return TrainState.create(
            apply_fn=model.module.apply,
            params=jax.tree_util.tree_map(jnp.asarray, snapshot), tx=tx,
        )

    step4 = make_train_step(model.module, "snli-ve", "ce", model.cfg.compute_dtype,
                            grad_accum_steps=4)
    _, m4 = step4(mk_state(), batch, jax.random.PRNGKey(2), None, distill.ref())
    _, m1 = step(mk_state(), batch, jax.random.PRNGKey(2), None, distill.ref())
    assert float(m4["distill_loss"]) == pytest.approx(float(m1["distill_loss"]),
                                                      rel=1e-5)


def test_driver_feature_distill_end_to_end(tmp_path):
    from climb_tpu.cli.train_upstream_continual_learning import main as driver

    out = str(tmp_path)
    driver([
        "--encoder_name", "vilt", "--pretrained_model_name", "scratch",
        "--ordered_cl_tasks", "snli-ve,nlvr2",
        "--cl_algorithm", "feature_distill", "--distill_loss_weight", "10.0",
        "--climb_data_dir", "/tmp/unused", "--synthetic", "--tiny",
        "--synthetic_train_size", "16", "--batch_size", "8",
        "--output_dir", out, "--do_train",
    ])
    run_dir = os.path.join(out, "vilt-feature_distill-task0_snli-ve-task1_nlvr2")
    with open(os.path.join(run_dir, "results.json")) as f:
        results = json.load(f)
    assert [r["task_key"] for r in results] == ["snli-ve", "nlvr2"]
    assert all(np.isfinite(r["best_score"]) for r in results)
