"""Device mesh construction for data/tensor parallel training.

The reference is single-device (SURVEY.md section 2.10: no DDP/NCCL
anywhere); this is the TPU-native scaling layer. A 2-axis mesh
('data', 'model') covers DP (gradient psum over ICI) and TP (attention-head /
MLP sharding); sequence-parallel attention rides the 'model' axis in the
Pallas kernel path. XLA inserts all collectives from sharding annotations —
there are no hand-written communication calls to port.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults to pure data parallelism over every local device. Device order
    follows jax.devices(), which on TPU enumerates ICI-contiguous chips —
    both mesh axes therefore map onto ICI rings, not DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
