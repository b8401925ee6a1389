"""Model registries (parity: reference ``src/modeling/__init__.py:4-12``).

String-keyed maps replacing the reference's ``load_encoder_map`` /
``create_continual_learner_map`` of live classes.
"""

from climb_tpu.models.model_config import (
    AdapterSpec,
    HeadSpec,
    ViltConfig,
    head_specs_from_task_configs,
)
from climb_tpu.models.vilt import ViltClassifier, ViltContinualLearner
from climb_tpu.models.vilt_core import ViltCore

ENCODER_REGISTRY = {
    "vilt": ViltCore,
    "viltbert": "climb_tpu.models.viltbert:ViltBertCore",  # lazy, resolved below
}

CONTINUAL_LEARNER_REGISTRY = {
    "vilt": ViltContinualLearner,
    "viltbert": "climb_tpu.models.viltbert:ViltBertContinualLearner",
}


def resolve(registry: dict, key: str):
    """Resolve a registry entry, importing lazily for string entries."""
    val = registry[key]
    if isinstance(val, str):
        module_name, attr = val.split(":")
        import importlib

        val = getattr(importlib.import_module(module_name), attr)
        registry[key] = val
    return val


__all__ = [
    "AdapterSpec",
    "HeadSpec",
    "ViltConfig",
    "ViltCore",
    "ViltClassifier",
    "ViltContinualLearner",
    "head_specs_from_task_configs",
    "ENCODER_REGISTRY",
    "CONTINUAL_LEARNER_REGISTRY",
    "resolve",
]
