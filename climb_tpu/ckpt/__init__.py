from climb_tpu.ckpt.checkpoint import (
    save_params,
    load_params,
    save_task_checkpoint,
    load_task_checkpoint,
    partial_load,
    task_checkpoint_exists,
)

__all__ = [
    "save_params",
    "load_params",
    "save_task_checkpoint",
    "load_task_checkpoint",
    "partial_load",
    "task_checkpoint_exists",
]
