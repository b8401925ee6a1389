from climb_tpu.ckpt.checkpoint import (
    save_params,
    load_params,
    save_task_checkpoint,
    load_task_checkpoint,
    save_train_state,
    load_train_state,
    partial_load,
    task_checkpoint_exists,
    task_dir,
)

__all__ = [
    "save_params",
    "load_params",
    "save_task_checkpoint",
    "load_task_checkpoint",
    "save_train_state",
    "load_train_state",
    "partial_load",
    "task_checkpoint_exists",
    "task_dir",
]
