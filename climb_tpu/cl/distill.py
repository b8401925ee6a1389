"""Feature distillation — a beyond-reference CL algorithm.

The reference ships sequential/singletask FT, experience replay, EWC,
adapters, and freezing (SURVEY.md section 2.3); this adds the classic
representation-anchoring family (LwF / "less-forgetting" style): after each
task the full model is snapshotted as a frozen TEACHER, and during the next
task every train step adds

    distill_loss_weight * mean_b || f_student(b) - f_teacher(b) ||^2 / K

where f(.) is the encoder's pooled head-input representation on the CURRENT
task's batch (``ViltContinualLearner.forward_with_features``). Anchoring
features rather than logits makes the penalty schema-free: it works
unchanged across single-image, image-pair (NLVR2), and multi-choice (VCR)
batch layouts, where logit distillation would need a compatible old head for
the new task's inputs.

Cost: one extra deterministic teacher forward per step while active (the
student's features ride along with its task forward — no second student
pass). The teacher is one full param tree; kept on device by default with
the same host-offload escape hatch as EWC.
"""

import logging

import jax
import jax.numpy as jnp

from climb_tpu.train.train_step import FdRef

logger = logging.getLogger(__name__)


class FeatureDistill:
    def __init__(self, args):
        self.loss_weight = float(getattr(args, "distill_loss_weight", 1.0))
        self.keep_on_device = not getattr(args, "distill_offload_to_host", False)
        self.teacher = None
        self.teacher_task = None

    def has_teacher(self) -> bool:
        return self.teacher is not None

    def save_teacher(self, task_key: str, params) -> None:
        """Snapshot the end-of-task model as the next task's teacher (the
        classic single-teacher formulation: always the latest model, which
        already carries the anchored history of earlier tasks)."""
        # jnp.array COPIES: the teacher must not alias the live train-state
        # buffers (the jitted step donates its state; a donated buffer can't
        # also arrive as the fd_ref argument of the same call)
        store = (lambda t: t) if self.keep_on_device else jax.device_get
        self.teacher = store(jax.tree_util.tree_map(jnp.array, params))
        self.teacher_task = task_key
        n = sum(x.size for x in jax.tree_util.tree_leaves(self.teacher))
        logger.info(
            "feature-distill teacher <- end of task '%s' (%.1fM params, %s)",
            task_key, n / 1e6, "device" if self.keep_on_device else "host",
        )

    def ref(self) -> FdRef:
        assert self.teacher is not None, "no teacher saved yet"
        return FdRef(
            teacher=jax.tree_util.tree_map(jnp.asarray, self.teacher),
            weight=jnp.asarray(self.loss_weight, jnp.float32),
        )
