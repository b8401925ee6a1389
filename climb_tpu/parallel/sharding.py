"""Sharding rules: map parameter-tree paths to PartitionSpecs.

Tensor-parallel layout for the ViLT encoder (Megatron-style, collectives
inserted by XLA from these annotations):

- q/k/v kernels  (L, D, D)   -> shard output dim over 'model' (head split)
- attn_out kernel (L, D, D)  -> shard input dim over 'model' (row split)
- fc1 kernel     (L, D, 4D)  -> shard output dim
- fc2 kernel     (L, 4D, D)  -> shard input dim
- biases of column-split layers shard with their outputs; everything else
  (embeddings, LayerNorms, heads, pooler) is replicated — at ViLT-base scale
  the embedding tables are the only large replicated tensors and fit easily.

Batches shard their leading axis over 'data'. With params annotated this way
and the train step under ``jax.jit``, GSPMD emits: all-gather/reduce-scatter
around the TP matmuls over 'model', and gradient psum over 'data' — all on
ICI.
"""

from typing import Tuple

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from climb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, REPLICA_AXIS

# (path-suffix, spec) rules; first match wins. Paths are tuples of str keys.
_COL_SPLIT = {"q", "k", "v", "fc1"}  # kernel (…, in, out): shard out
_ROW_SPLIT = {"attn_out", "fc2"}     # kernel (…, in, out): shard in


def param_spec(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one parameter leaf, by its tree path."""
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if len(names) >= 2 and names[-1] == "kernel":
        owner = names[-2]
        # adapters: ('...', 'adapter_mlp_task', 'down'|'up', 'kernel')
        if owner in _COL_SPLIT or owner == "down":
            return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
        if owner in _ROW_SPLIT or owner == "up":
            return P(*([None] * (leaf.ndim - 2) + [MODEL_AXIS, None]))
    if len(names) >= 2 and names[-1] == "bias" and names[-2] in _COL_SPLIT:
        return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
    return P()  # replicated


def param_sharding_rules(params, mesh) -> dict:
    """Pytree of NamedShardings matching `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_spec(path, leaf)), params
    )


def shard_params(params, mesh):
    """Place a parameter pytree onto the mesh per the TP rules."""
    return jax.device_put(params, param_sharding_rules(params, mesh))


def batch_spec(leaf, mesh=None) -> P:
    ndim = getattr(leaf, "ndim", 0)
    if ndim == 0:
        return P()
    # on a multi-slice mesh the batch splits over DCN replicas AND the
    # intra-slice data axis (hierarchical data parallelism)
    if mesh is not None and REPLICA_AXIS in getattr(mesh, "axis_names", ()):
        lead = (REPLICA_AXIS, DATA_AXIS)
    else:
        lead = DATA_AXIS
    return P(*([lead] + [None] * (ndim - 1)))


def shard_batch(batch, mesh):
    """Shard every batch leaf's leading axis across the data-parallel axes."""
    return jax.device_put(
        batch,
        jax.tree_util.tree_map(
            lambda x: NamedSharding(mesh, batch_spec(x, mesh)), batch
        ),
    )


def replicate(tree, mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
