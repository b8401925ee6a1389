"""Behavioral CL test: EWC reduces drift from the anchor task's parameters.

Trains task A, snapshots EWC state, trains task B with and without the EWC
penalty, and asserts the penalty keeps encoder parameters closer to the
task-A anchor — the mechanism behind reduced catastrophic forgetting.
"""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.configs import task_configs
from climb_tpu.train import CLModel, TrainState, create_cl_model, get_task_trainer_class
from climb_tpu.train.optimizer import make_optimizer
from climb_tpu.train.train_step import make_train_step


def _args(**kw):
    base = dict(
        batch_size=8, seed=3, synthetic=True, synthetic_train_size=24, tiny=True,
        num_workers=2, replay_frequency=100,
        ordered_cl_tasks=["snli-ve", "nlvr2"], encoder_name="vilt",
        pretrained_model_name="scratch", image_height=64, image_width=96,
        ewc_fisher_sample_percentage=0.5, ewc_loss_weight=1e4,
    )
    base.update(kw)
    return SimpleNamespace(**base)


def _param_dist(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    return float(sum(jnp.sum((x - y) ** 2) for x, y in zip(leaves_a, leaves_b)))


def test_ewc_limits_drift():
    from climb_tpu.cl import EWC

    args = _args()
    model = create_cl_model(args, task_configs)

    # task A: short training on snli-ve
    trainer_a = get_task_trainer_class("snli-ve")(args, task_configs, {})
    trainer_a.num_epochs = 2
    trainer_a.lr = 3e-4
    trainer_a.max_steps = len(trainer_a.train_dataloader) * 2
    _, model = trainer_a.train(model)
    anchor = jax.device_get(model.encoder_params())

    ewc = EWC(args)
    ewc.save_task_parameters("snli-ve", model, trainer_a, jax.random.PRNGKey(0))
    assert ewc.has_tasks()

    # task B with/without the EWC penalty, from the same starting point
    def train_b(use_ewc):
        m = model.with_params(jax.tree_util.tree_map(jnp.array, model.params))
        trainer_b = get_task_trainer_class("nlvr2")(args, task_configs, {})
        trainer_b.num_epochs = 2
        trainer_b.lr = 3e-4
        trainer_b.max_steps = len(trainer_b.train_dataloader) * 2
        _, m = trainer_b.train(m, ewc=ewc if use_ewc else None)
        return _param_dist(m.encoder_params(), anchor)

    drift_plain = train_b(False)
    drift_ewc = train_b(True)
    assert drift_ewc < drift_plain, (drift_ewc, drift_plain)
