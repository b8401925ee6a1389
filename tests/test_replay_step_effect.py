"""A replay step must actually MOVE parameters.

Regression for an r05 hardware finding: the fresh-per-step replay optimizer
(reference quirk, experience_replay.py:61 — a plain constant-lr AdamW with
no scheduler) was built WITH the warmup schedule, so its single step ran at
optimizer-count 0 where warmup lr == 0 — every replay step logged a loss
but left parameters bit-identical (sequential_ft and experience_replay
produced byte-equal task checkpoints on the chip).
"""

from types import SimpleNamespace

import numpy as np
import pytest

import jax

from climb_tpu.configs import task_configs
from climb_tpu.train import create_cl_model, get_task_trainer_class

pytestmark = pytest.mark.smoke


def test_replay_step_changes_params():
    args = SimpleNamespace(
        batch_size=8, seed=3, synthetic=True, synthetic_train_size=24,
        tiny=True, num_workers=2, replay_frequency=100,
        memory_percentage=0.5, memory_sampling_strategy="random",
        ordered_cl_tasks=["snli-ve", "nlvr2"], encoder_name="vilt",
        pretrained_model_name="scratch", image_height=64, image_width=96,
    )
    from climb_tpu.cl import ExperienceReplayMemory

    model = create_cl_model(args, task_configs)
    trainer = get_task_trainer_class(task_configs["snli-ve"]["trainer"])(
        args, task_configs, model_config={"encoder_dim": 64})
    mem = ExperienceReplayMemory()
    mem.set_model(model)
    mem.add_task_memory_buffer(args, "snli-ve", task_configs["snli-ve"],
                               trainer, 0.5, "random")
    assert mem.do_replay()

    before = jax.device_get(model.params)
    after = mem.run_replay_step(model.params, jax.random.PRNGKey(0))
    after = jax.device_get(after)
    moved = sum(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after))
    )
    assert moved > 0.0, (
        "replay step left every parameter bit-identical — the fresh replay "
        "optimizer is taking its step at warmup lr=0 again")


def test_replay_optimizer_uses_constant_task_lr():
    """The single fresh-optimizer step must apply at the task's peak lr
    (reference: torch AdamW with no scheduler), not the warmup ramp."""
    from climb_tpu.train.optimizer import polynomial_warmup_schedule

    # the schedule the replay step must NOT use at count 0
    assert float(polynomial_warmup_schedule(1e-4, 100, 0.1)(0)) == 0.0
    # the schedule it gets with warmup_ratio=0: peak lr at count 0
    assert float(polynomial_warmup_schedule(1e-4, 100, 0.0)(0)) == pytest.approx(1e-4, rel=1e-4)
