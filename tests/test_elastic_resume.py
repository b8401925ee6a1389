"""Mid-task elastic resume: a run killed between epochs and resumed from the
full-train-state checkpoint must reproduce the uninterrupted trajectory
exactly (loader shuffling is stateless in (seed, epoch); the dropout rng
chain and AdamW moments are restored from the checkpoint)."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax

from climb_tpu.configs import task_configs
from climb_tpu.train import create_cl_model, get_task_trainer_class


def make_args(tmp, **kw):
    base = dict(
        batch_size=8,
        seed=42,
        synthetic=True,
        synthetic_train_size=24,
        tiny=True,
        num_workers=2,
        replay_frequency=100,
        ordered_cl_tasks=["snli-ve"],
        encoder_name="vilt",
        pretrained_vilt_name="scratch",
        image_height=64,
        image_width=96,
        task_ckpt_dir=str(tmp),
        save_state_epochs=1,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def _make_trainer(args, epochs=3):
    trainer_cls = get_task_trainer_class(task_configs["snli-ve"]["trainer"])
    trainer = trainer_cls(args, task_configs, model_config={"encoder_dim": 64})
    trainer.num_epochs = epochs
    trainer.max_steps = len(trainer.train_dataloader) * epochs
    return trainer


class _Boom(Exception):
    pass


def test_interrupted_run_resumes_to_identical_params(tmp_path):
    full_dir = tmp_path / "full"
    res_dir = tmp_path / "resumed"
    full_dir.mkdir(), res_dir.mkdir()

    # --- uninterrupted 3-epoch run ---
    args = make_args(full_dir)
    model = create_cl_model(args, task_configs)
    trainer = _make_trainer(args)
    score_full, model_full = trainer.train(model)

    # --- same run, killed during epoch 3's eval, then resumed ---
    args2 = make_args(res_dir)
    model2 = create_cl_model(args2, task_configs)
    trainer2 = _make_trainer(args2)
    orig_eval = type(trainer2).eval
    calls = {"n": 0}

    def dying_eval(self, params, m):
        calls["n"] += 1
        if calls["n"] == 3:
            raise _Boom()  # dies mid-epoch-3, after epoch 2's state save
        return orig_eval(self, params, m)

    type(trainer2).eval = dying_eval
    try:
        with pytest.raises(_Boom):
            trainer2.train(model2)
    finally:
        type(trainer2).eval = orig_eval

    assert (res_dir / "train_state").exists()

    # fresh process simulation: new trainer + fresh model, same args
    model3 = create_cl_model(args2, task_configs)
    trainer3 = _make_trainer(args2)
    score_res, model_res = trainer3.train(model3)

    assert score_res == pytest.approx(score_full, abs=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        model_full.params,
        model_res.params,
    )
    # completed run cleans its elastic state; the task ckpt supersedes it
    assert not (res_dir / "train_state").exists()
    assert not (full_dir / "train_state").exists()


def test_train_state_roundtrip_includes_optimizer_moments(tmp_path):
    from climb_tpu.ckpt import load_train_state, save_train_state
    from climb_tpu.train import TrainState, make_train_step
    from climb_tpu.train.optimizer import make_optimizer

    args = make_args(tmp_path)
    model = create_cl_model(args, task_configs)
    tx = make_optimizer(model.params, lr=1e-3, total_steps=10, warmup_ratio=0.0)
    state = TrainState.create(apply_fn=model.module.apply, params=model.params, tx=tx)
    step = make_train_step(model.module, "snli-ve", "ce")
    cfg = model.cfg
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(1, cfg.vocab_size, (4, cfg.max_text_len)).astype(np.int32),
        "text_mask": np.ones((4, cfg.max_text_len), np.float32),
        "pixel_values": rng.randint(0, 255, (4, cfg.image_height, cfg.image_width, 3)).astype(np.uint8),
        "patch_hw": np.tile([[cfg.grid_h, cfg.grid_w]], (4, 1)).astype(np.int32),
        "labels": rng.randint(0, 3, (4,)).astype(np.int32),
    }
    batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    state, _ = step(state, batch, jax.random.PRNGKey(0))

    path = str(tmp_path / "ts")
    save_train_state(state, {"epoch": 1, "global_step": 1, "best_score": 0.5,
                             "best_epoch": 1, "rng": np.zeros(2, np.uint32)}, path)
    template = TrainState.create(apply_fn=model.module.apply, params=model.params, tx=tx)
    restored, meta = load_train_state(template, path)
    assert int(meta["epoch"]) == 1
    assert int(restored.step) == int(state.step) == 1

    # every leaf, including AdamW mu/nu, must round-trip exactly
    want = jax.tree_util.tree_leaves(jax.device_get(state))
    got = jax.tree_util.tree_leaves(jax.device_get(restored))
    assert len(want) == len(got)
    for a, b in zip(want, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and continuing one step from each must agree
    s1, m1 = step(state, batch, jax.random.PRNGKey(7))
    s2, m2 = step(restored, batch, jax.random.PRNGKey(7))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=0)


def test_corrupt_elastic_state_restarts_task(tmp_path):
    """A truncated/garbage train_state (host died mid-write, version skew)
    must degrade to a fresh task run instead of crashing the experiment."""
    (tmp_path / "train_state").write_bytes(b"\x00garbage not msgpack")

    args = make_args(tmp_path)
    model = create_cl_model(args, task_configs)
    trainer = _make_trainer(args, epochs=2)
    score, trained = trainer.train(model)
    assert 0.0 <= score <= 100.0
    # completed run cleaned up its elastic state as usual
    assert not (tmp_path / "train_state").exists()


def test_async_checkpoint_writer_unit(tmp_path):
    """Ordering per path, atomicity (tmp+rename), and error propagation."""
    import os

    from climb_tpu.ckpt.checkpoint import AsyncCheckpointWriter, load_params

    w = AsyncCheckpointWriter()
    p = str(tmp_path / "ckpt")
    for i in range(4):  # successive writes to one path land in order
        w.submit({"a": np.full((8,), i, np.float32)}, p)
    w.flush()
    assert load_params(p)["a"][0] == 3.0
    assert not os.path.exists(p + ".tmp")  # rename consumed the temp file

    # a writer failure surfaces at flush, not silently
    w.submit({"a": np.zeros(2)}, "/proc/denied/ckpt")  # unwritable target
    with pytest.raises(OSError):
        w.flush()
    w.close()


def test_async_elastic_run_matches_sync(tmp_path):
    """--async_checkpoint changes WHEN bytes hit disk, not what trains or
    what resumes: the interrupted+resumed async run reproduces the sync
    uninterrupted trajectory exactly, and its on-disk elastic files are
    complete/loadable at every epoch boundary."""
    sync_dir, async_dir = tmp_path / "sync", tmp_path / "async"
    sync_dir.mkdir(), async_dir.mkdir()

    args = make_args(sync_dir)
    model = create_cl_model(args, task_configs)
    score_sync, model_sync = _make_trainer(args).train(model)

    args2 = make_args(async_dir, async_checkpoint=True)
    model2 = create_cl_model(args2, task_configs)
    trainer2 = _make_trainer(args2)
    orig_eval = type(trainer2).eval
    calls = {"n": 0}

    def dying_eval(self, params, m):
        calls["n"] += 1
        if calls["n"] == 3:
            raise _Boom()
        return orig_eval(self, params, m)

    type(trainer2).eval = dying_eval
    try:
        with pytest.raises(_Boom):
            trainer2.train(model2)
    finally:
        type(trainer2).eval = orig_eval
    # the finally-path close() joined pending writes: state is complete NOW
    assert (async_dir / "train_state").exists()
    assert not (async_dir / "train_state.tmp").exists()

    model3 = create_cl_model(args2, task_configs)
    score_async, model_res = _make_trainer(args2).train(model3)
    assert score_async == pytest.approx(score_sync, abs=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        model_sync.params,
        model_res.params,
    )
