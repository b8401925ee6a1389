from climb_tpu.cl.experience_replay import ExperienceReplayMemory, TaskMemoryBuffer
from climb_tpu.cl.ewc import EWC
from climb_tpu.cl.freeze import (
    full_trainable_mask,
    freeze_encoder_mask,
    freeze_bottom_k_layers_mask,
    adapter_only_mask,
)
from climb_tpu.cl.adapters import AdapterHandler, SUPPORTED_ADAPTER_METHODS
from climb_tpu.cl.distill import FeatureDistill

__all__ = [
    "ExperienceReplayMemory",
    "TaskMemoryBuffer",
    "EWC",
    "FeatureDistill",
    "AdapterHandler",
    "SUPPORTED_ADAPTER_METHODS",
    "full_trainable_mask",
    "freeze_encoder_mask",
    "freeze_bottom_k_layers_mask",
    "adapter_only_mask",
]
