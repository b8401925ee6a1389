from climb_tpu.configs.task_configs import task_configs, SUPPORTED_VL_TASKS
from climb_tpu.configs.model_configs import model_configs, ALLOWED_CL_ENCODERS
from climb_tpu.configs.adapter_configs import ADAPTER_MAP
from climb_tpu.configs.wandb_config import wandb_config

__all__ = [
    "task_configs",
    "SUPPORTED_VL_TASKS",
    "model_configs",
    "ALLOWED_CL_ENCODERS",
    "ADAPTER_MAP",
    "wandb_config",
]
