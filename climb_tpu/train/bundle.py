"""Model bundle: the unit passed between driver, trainers, and CL algorithms.

The reference passes a mutable ``nn.Module`` around
(``train_upstream_continual_learning.py``); functionally this is (static
module definition, parameter pytree, mesh, trainability mask) — the mask is
how freeze/adapter algorithms express themselves (reference mutates
``requires_grad`` instead, vilt.py:126-144).
"""

import dataclasses
from typing import Any, Optional, Tuple

from climb_tpu.models.model_config import HeadSpec, ViltConfig


@dataclasses.dataclass
class CLModel:
    module: Any                       # ViltContinualLearner (or variant)
    cfg: ViltConfig
    head_specs: Tuple[HeadSpec, ...]
    params: Any                       # parameter pytree (device-resident)
    mesh: Optional[Any] = None        # jax.sharding.Mesh or None
    trainable_mask: Optional[Any] = None  # float pytree; None = train all
    encoder_key: str = "vilt"         # params subtree key of the encoder
    frozen_text_params: Optional[Any] = None  # ViLT-BERT's frozen BERT params

    def with_params(self, params) -> "CLModel":
        return dataclasses.replace(self, params=params)

    def encoder_params(self):
        return self.params[self.encoder_key]
