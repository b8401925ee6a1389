from climb_tpu.train.bundle import CLModel
from climb_tpu.train.optimizer import make_optimizer, polynomial_warmup_schedule
from climb_tpu.train.train_state import TrainState
from climb_tpu.train.train_step import (
    EwcRef,
    make_eval_step,
    make_grad_fn,
    make_replay_step,
    make_train_step,
)
from climb_tpu.train.trainers import (
    LOSS_TYPES,
    LowShotVLTaskTrainer,
    TRAINER_REGISTRY,
    VLTaskTrainer,
    get_task_trainer_class,
)
from climb_tpu.train.model_factory import create_cl_model

__all__ = [
    "CLModel",
    "EwcRef",
    "LOSS_TYPES",
    "LowShotVLTaskTrainer",
    "TRAINER_REGISTRY",
    "TrainState",
    "VLTaskTrainer",
    "create_cl_model",
    "get_task_trainer_class",
    "make_eval_step",
    "make_grad_fn",
    "make_optimizer",
    "make_replay_step",
    "make_train_step",
    "polynomial_warmup_schedule",
]
