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
from climb_tpu.ckpt.sharded import (
    is_sharded_checkpoint,
    load_sharded,
    save_sharded,
)
from climb_tpu.ckpt.torch_import import (
    convert_torch_state_dict,
    export_torch_state_dict,
    is_torch_checkpoint,
    load_reference_checkpoint,
    save_reference_checkpoint,
)

__all__ = [
    "convert_torch_state_dict",
    "export_torch_state_dict",
    "is_torch_checkpoint",
    "load_reference_checkpoint",
    "save_reference_checkpoint",
    "save_params",
    "load_params",
    "save_task_checkpoint",
    "load_task_checkpoint",
    "save_train_state",
    "load_train_state",
    "partial_load",
    "task_checkpoint_exists",
    "task_dir",
    "is_sharded_checkpoint",
    "load_sharded",
    "save_sharded",
]
