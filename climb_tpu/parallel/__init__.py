from climb_tpu.parallel.mesh import (
    make_mesh,
    make_multislice_mesh,
    DATA_AXIS,
    MODEL_AXIS,
    REPLICA_AXIS,
)
from climb_tpu.parallel.sharding import (
    param_sharding_rules,
    shard_params,
    shard_batch,
    batch_spec,
    replicate,
)

__all__ = [
    "make_mesh",
    "make_multislice_mesh",
    "DATA_AXIS",
    "MODEL_AXIS",
    "REPLICA_AXIS",
    "param_sharding_rules",
    "shard_params",
    "shard_batch",
    "batch_spec",
    "replicate",
]
