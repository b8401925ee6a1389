"""Adapter algorithm handler (parity: reference ``src/cl_algorithms/adapters.py``).

The reference needs the GLAMOR adapter-transformers fork to patch adapters
into ``ViltModel``; here adapters are native Flax modules
(``climb_tpu.models.adapters``), so the handler's job is purely functional:
resolve the adapter architecture from the registry, rebuild the model module
with the active adapter (a static attribute — each task's train step compiles
with exactly one adapter live), and produce the adapter-only trainability
mask.
"""

import dataclasses
import logging

from climb_tpu.configs.adapter_configs import ADAPTER_MAP
from climb_tpu.cl.freeze import adapter_only_mask
from climb_tpu.models.model_config import AdapterSpec

logger = logging.getLogger(__name__)

SUPPORTED_ADAPTER_METHODS = ["vanilla"]


class AdapterHandler:
    def __init__(self, adapter_method: str, args):
        assert adapter_method in SUPPORTED_ADAPTER_METHODS
        self.args = args
        self.adapter_method = adapter_method
        spec_dict = dict(ADAPTER_MAP[args.adapter_config])
        if getattr(args, "adapter_reduction_factor", 0) > 0:
            spec_dict["reduction_factor"] = args.adapter_reduction_factor
        if spec_dict.get("lora"):
            if getattr(args, "lora_rank", 0) > 0:
                spec_dict["lora_rank"] = args.lora_rank
            if getattr(args, "lora_alpha", 0) > 0:
                spec_dict["lora_alpha"] = float(args.lora_alpha)
            if getattr(args, "lora_targets", None):
                spec_dict["lora_targets"] = tuple(args.lora_targets.split(","))
        self.adapter_spec = AdapterSpec.from_dict(spec_dict)
        logger.info("Adapter configuration: %s", self.adapter_spec)

    def add_adapters_to_model(self, model):
        """Rebuild the module with one adapter per CL task declared.

        Must be applied BEFORE parameter init (adapters are part of the
        parameter tree). Returns the updated CLModel (params unchanged).
        """
        module = dataclasses.replace(
            model.module,
            adapter_spec=self.adapter_spec,
            adapter_tasks=tuple(self.args.ordered_cl_tasks),
        )
        return dataclasses.replace(model, module=module)

    def activate_adapter_for_training(self, task_key: str, model):
        """Activate `task_key`'s adapter and freeze everything else."""
        module = dataclasses.replace(model.module, active_adapter=task_key)
        mask = adapter_only_mask(model.params, task_key, model.encoder_key)
        return dataclasses.replace(model, module=module, trainable_mask=mask)

    def activate_adapter_for_eval(self, task_key: str, model):
        module = dataclasses.replace(model.module, active_adapter=task_key)
        return dataclasses.replace(model, module=module)
