"""Graceful preemption: a SIGTERM-style interrupt mid-epoch saves the full
train state including the loader position, and the resumed run reproduces
the uninterrupted trajectory EXACTLY (the loader skips the already-consumed
batch prefix of the deterministic (seed, epoch) shuffle; the rng chain and
AdamW moments come from the checkpoint)."""

import os
import signal

import numpy as np
import pytest

import jax

from climb_tpu.configs import task_configs
from climb_tpu.train import create_cl_model, get_task_trainer_class
from climb_tpu.utils import preemption

from tests.test_elastic_resume import make_args, _make_trainer


@pytest.fixture(autouse=True)
def _clear_flag():
    preemption.clear_preemption()
    yield
    preemption.clear_preemption()


def test_sigterm_sets_flag():
    before = signal.getsignal(signal.SIGTERM)
    assert preemption.install_preemption_handler()
    try:
        assert not preemption.preemption_requested()
        os.kill(os.getpid(), signal.SIGTERM)
        assert preemption.preemption_requested()
    finally:
        preemption.uninstall_preemption_handler()
    # the handler must not outlive its scope: a leaked flag-only handler
    # makes the whole process ignore SIGTERM (observed: a pytest run
    # outliving its `timeout` wrapper)
    assert signal.getsignal(signal.SIGTERM) is before
    # ...but an un-acted-on request SURVIVES uninstall: a SIGTERM landing
    # after the loop's last poll must stay pending for the driver's
    # between-task check instead of being silently dropped
    assert preemption.preemption_requested()


def test_driver_honors_pending_preemption_at_task_boundary(tmp_path):
    """A preemption request the train loop never acted on (landed after its
    last poll, or elastic checkpointing is off so the loop doesn't poll at
    all) must make the DRIVER exit 143 at the next task boundary — task 1's
    checkpoint/results are on disk, and the rerun skips it."""
    import json

    from climb_tpu.cli.train_upstream_continual_learning import (
        main as upstream_main,
    )

    out = tmp_path / "exp"
    argv = [
        "--encoder_name", "vilt", "--pretrained_model_name", "scratch",
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "16",
        "--batch_size", "8",
        "--output_dir", str(out),
        "--ordered_cl_tasks", "snli-ve,nlvr2",
        "--cl_algorithm", "sequential_ft", "--do_train",
        "--save_state_epochs", "0",
    ]
    # --save_state_epochs 0: the trainer never polls, so the pending flag
    # reaches the driver's between-task check untouched
    preemption.request_preemption()
    with pytest.raises(SystemExit) as e:
        upstream_main(argv)
    assert e.value.code == 143
    exp_dir = next(p for p in out.iterdir() if p.is_dir())
    results = json.loads((exp_dir / "results.json").read_text())
    assert [r["task_key"] for r in results] == ["snli-ve"]  # task 1 persisted

    preemption.clear_preemption()
    upstream_main(argv)  # rerun: skips task 1, completes task 2
    results = json.loads((exp_dir / "results.json").read_text())
    assert [r["task_key"] for r in results] == ["snli-ve", "nlvr2"]


def test_trainer_restores_sigterm_handler(tmp_path):
    """A completed in-process train loop must leave the process SIGTERM
    handler exactly as it found it (the install is scoped via finally)."""
    before = signal.getsignal(signal.SIGTERM)
    args = make_args(tmp_path)
    model = create_cl_model(args, task_configs)
    trainer = _make_trainer(args)
    trainer.train(model)
    assert signal.getsignal(signal.SIGTERM) is before


def test_preempted_mid_epoch_resumes_to_identical_params(tmp_path):
    full_dir = tmp_path / "full"
    pre_dir = tmp_path / "pre"
    full_dir.mkdir(), pre_dir.mkdir()

    # --- uninterrupted 3-epoch run (24 examples / bs 8 = 3 steps/epoch) ---
    args = make_args(full_dir)
    model = create_cl_model(args, task_configs)
    trainer = _make_trainer(args)
    score_full, model_full = trainer.train(model)

    # --- same run, "preempted" after step 5 (epoch 2, step 2) ---
    args2 = make_args(pre_dir)
    model2 = create_cl_model(args2, task_configs)
    trainer2 = _make_trainer(args2)
    orig = type(trainer2)._next_rng
    calls = {"n": 0}

    def hooked(self):
        calls["n"] += 1
        if calls["n"] == 5:
            preemption.request_preemption()  # what the SIGTERM handler does
        return orig(self)

    type(trainer2)._next_rng = hooked
    try:
        with pytest.raises(SystemExit) as e:
            trainer2.train(model2)
    finally:
        type(trainer2)._next_rng = orig
    assert e.value.code == 143

    from climb_tpu.ckpt import load_train_state
    from climb_tpu.train import TrainState
    from climb_tpu.train.optimizer import make_optimizer

    assert (pre_dir / "train_state").exists()
    tmpl_model = create_cl_model(args2, task_configs)
    tx = make_optimizer(tmpl_model.params, lr=1e-3, total_steps=9)
    template = TrainState.create(
        apply_fn=tmpl_model.module.apply, params=tmpl_model.params, tx=tx
    )
    _, meta = load_train_state(template, str(pre_dir / "train_state"))
    assert int(meta["epoch"]) == 1  # re-enters epoch 2
    assert int(meta["steps_into_epoch"]) == 2
    assert int(meta["global_step"]) == 5

    # --- fresh-process resume: must match the uninterrupted run exactly ---
    preemption.clear_preemption()
    model3 = create_cl_model(args2, task_configs)
    trainer3 = _make_trainer(args2)
    score_res, model_res = trainer3.train(model3)

    assert score_res == pytest.approx(score_full, abs=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        model_full.params,
        model_res.params,
    )


def test_er_run_preempted_and_resumed_is_bit_identical(tmp_path):
    """Experience replay consumes the python RNG (buffer + replay-task
    sampling); the preemption checkpoint captures and restores it, so even an
    ER run interrupted mid-task resumes to the exact uninterrupted result."""
    import json

    from climb_tpu.ckpt import load_params
    from climb_tpu.cli.train_upstream_continual_learning import main as upstream_main
    from climb_tpu.train import trainers as trainers_mod

    def args_for(out):
        return [
            "--encoder_name", "vilt",
            "--pretrained_model_name", "scratch",
            "--climb_data_dir", "/tmp/unused",
            "--synthetic", "--tiny", "--synthetic_train_size", "16",
            "--batch_size", "8",
            "--output_dir", str(out),
            "--ordered_cl_tasks", "snli-ve,nlvr2",
            "--cl_algorithm", "experience_replay",
            "--memory_percentage", "0.2",
            "--memory_sampling_strategy", "random",
            "--replay_frequency", "2",
            "--do_train",
        ]

    full_dir, pre_dir = tmp_path / "full", tmp_path / "pre"
    upstream_main(args_for(full_dir))

    # interrupted run: preempt mid-task-2 (task 1 = 10 steps; trigger later)
    cls = trainers_mod.VLTaskTrainer
    orig = cls._next_rng
    calls = {"n": 0}

    def hooked(self):
        calls["n"] += 1
        if calls["n"] == 25:
            preemption.request_preemption()
        return orig(self)

    cls._next_rng = hooked
    try:
        with pytest.raises(SystemExit):
            upstream_main(args_for(pre_dir))
    finally:
        cls._next_rng = orig
    preemption.clear_preemption()

    upstream_main(args_for(pre_dir))  # resume to completion

    exp = "vilt-experience_replay-task0_snli-ve-task1_nlvr2"
    for task in ["task0_snli-ve", "task1_nlvr2"]:
        a = load_params(str(full_dir / exp / "checkpoints" / task / "model"))
        b = load_params(str(pre_dir / exp / "checkpoints" / task / "model"))
        jax.tree_util.tree_map(
            lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
            a, b,
        )
    ra = json.loads((full_dir / exp / "results.json").read_text())
    rb = json.loads((pre_dir / exp / "results.json").read_text())
    assert [r["best_score"] for r in ra] == [r["best_score"] for r in rb]


def test_loader_skip_reproduces_suffix():
    from climb_tpu.data.collation import stack_collate
    from climb_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 20

        def __getitem__(self, i):
            return {"x": np.full((2,), i, np.int32)}

    dl = DataLoader(DS(), 4, stack_collate, shuffle=True, seed=7, num_workers=1)
    dl.set_epoch(3)
    full = [b["x"][:, 0].tolist() for b in dl]
    dl.set_epoch(3)
    dl.set_skip(2)
    tail = [b["x"][:, 0].tolist() for b in dl]
    assert tail == full[2:]
    # skip is one-shot: the next iteration is complete again
    dl.set_epoch(3)
    again = [b["x"][:, 0].tolist() for b in dl]
    assert again == full
