"""Elastic Weight Consolidation (parity: reference ``src/cl_algorithms/ewc.py``).

After each task (except the last), snapshot the *encoder* parameters and
accumulate a diagonal Fisher — the sum of squared gradients over
``ewc_fisher_sample_percentage`` of the train set, run through the task's
train step with no optimizer update, normalized by samples seen (reference
ewc.py:59-71). During later tasks every train step adds
``ewc_loss_weight * sum_i F_i (theta_i - theta*_i)^2`` for ONE randomly
chosen previous task (reference compute_ewc_loss, ewc.py:75-87) — the random
choice happens on the host; the penalty itself is fused into the jitted loss
(``climb_tpu.train.train_step.ewc_penalty``).

State scale note (SURVEY.md "hard parts" #4): Fisher + snapshot are ~2x the
encoder size per task. They are kept on device by default (ViLT-base scale
fits easily in HBM) with a host-offload flag for larger models.
"""

import logging
import random
from typing import Dict, List

import jax
import jax.numpy as jnp

from climb_tpu.train.train_step import EwcRef, make_grad_fn

logger = logging.getLogger(__name__)


class EWC:
    def __init__(self, args):
        self.fisher_sample_percentage = args.ewc_fisher_sample_percentage
        self.ewc_loss_weight = args.ewc_loss_weight
        self.keep_on_device = not getattr(args, "ewc_offload_to_host", False)
        self.fisher_dict: Dict[str, dict] = {}
        self.param_dict: Dict[str, dict] = {}
        self.task_keys: List[str] = []

    def has_tasks(self) -> bool:
        return len(self.task_keys) > 0

    # reference name parity
    def do_ewc(self) -> bool:
        return self.has_tasks()

    def save_task_parameters(self, task_key: str, model, task_trainer, rng):
        """Snapshot encoder params + accumulate the diagonal Fisher."""
        assert task_key not in self.task_keys
        enc = model.encoder_params()
        store = (lambda t: t) if self.keep_on_device else jax.device_get
        self.param_dict[task_key] = store(jax.tree_util.tree_map(jnp.asarray, enc))

        grad_fn = make_grad_fn(
            model.module, task_key, task_trainer.loss_type, model.cfg.compute_dtype
        )
        loader = task_trainer.get_train_dataloader()
        fisher_sample_size = int(
            self.fisher_sample_percentage * len(loader.dataset)
        )
        fisher = jax.tree_util.tree_map(jnp.zeros_like, enc)
        samples = 0
        for batch in loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, sub = jax.random.split(rng)
            _, grads = grad_fn(model.params, batch, sub)
            g_enc = grads[model.encoder_key]
            fisher = jax.tree_util.tree_map(lambda f, g: f + g**2, fisher, g_enc)
            samples += int(batch["valid"].sum()) if "valid" in batch else batch["input_ids"].shape[0]
            if samples >= fisher_sample_size:
                break
        samples = max(samples, 1)
        fisher = jax.tree_util.tree_map(lambda f: f / samples, fisher)
        self.fisher_dict[task_key] = store(fisher)
        self.task_keys.append(task_key)
        logger.info("Saved EWC parameters for task %s (%d Fisher samples)", task_key, samples)

    def sample_ref(self) -> EwcRef:
        """Random previous task's (fisher, anchor, weight) for this step."""
        task_key = random.choice(self.task_keys)
        return EwcRef(
            fisher=jax.tree_util.tree_map(jnp.asarray, self.fisher_dict[task_key]),
            anchor=jax.tree_util.tree_map(jnp.asarray, self.param_dict[task_key]),
            weight=jnp.asarray(self.ewc_loss_weight, jnp.float32),
        )
