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
REPLICA_AXIS = "replica"  # across-slice (DCN) axis of multi-slice meshes
PIPE_AXIS = "pipe"        # pipeline-stage axis (parallel/pipeline.py)


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


def make_dp_pp_mesh(
    n_pipe: int,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'pipe') mesh: pipeline stages over contiguous ICI
    neighbors (each stage-to-stage ppermute hop is one link), the remaining
    device factor as data parallelism. The encoder's scan-stacked layer axis
    is sharded over 'pipe' (sharding.param_spec with pp=True); batches shard
    their leading axis over 'data' exactly as on the DP x TP mesh."""
    devices = list(devices if devices is not None else jax.devices())
    n_data = len(devices) // n_pipe
    assert n_data * n_pipe == len(devices), (
        f"mesh {n_data}x{n_pipe} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_pipe)
    return Mesh(arr, (DATA_AXIS, PIPE_AXIS))


def make_multislice_mesh(
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    slice_count: Optional[int] = None,
) -> Mesh:
    """Hybrid DCN x ICI mesh for multi-slice pods: ('replica', 'data', 'model').

    The 'replica' axis spans slices (DCN) and carries ONLY the data-parallel
    gradient all-reduce (params are replicated across it — their specs never
    name 'replica'); 'data' and 'model' stay within a slice so TP/SP
    collectives and the intra-slice gradient reduce-scatter ride ICI. GSPMD
    then reduces gradients hierarchically: reduce within slices first, then
    one small all-reduce per tensor across the DCN.

    Slice membership comes from ``device.slice_index`` on real multi-slice
    TPU; pass ``slice_count`` to partition devices into contiguous groups
    instead (CPU-mesh simulation, tests/test_mesh_training_equivalence.py).
    """
    devices = list(devices if devices is not None else jax.devices())
    if slice_count is None:
        groups: dict = {}
        for d in devices:
            groups.setdefault(getattr(d, "slice_index", 0), []).append(d)
        slices = [groups[k] for k in sorted(groups)]
    else:
        per = len(devices) // slice_count
        assert per * slice_count == len(devices)
        slices = [devices[i * per:(i + 1) * per] for i in range(slice_count)]
    per_slice = len(slices[0])
    assert all(len(s) == per_slice for s in slices), "uneven slices"
    assert per_slice % n_model == 0, f"{per_slice} devices/slice not divisible by n_model={n_model}"
    arr = np.asarray(slices).reshape(len(slices), per_slice // n_model, n_model)
    return Mesh(arr, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))
