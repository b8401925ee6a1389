from climb_tpu.parallel.mesh import make_mesh, DATA_AXIS, MODEL_AXIS
from climb_tpu.parallel.sharding import (
    param_sharding_rules,
    shard_params,
    shard_batch,
    batch_spec,
    replicate,
)

__all__ = [
    "make_mesh",
    "DATA_AXIS",
    "MODEL_AXIS",
    "param_sharding_rules",
    "shard_params",
    "shard_batch",
    "batch_spec",
    "replicate",
]
