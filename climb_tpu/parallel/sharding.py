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

Fully-sharded data parallelism (ZeRO-3 style) is one more layer of the same
annotations: ``fsdp=True`` additionally shards each large parameter leaf
over the 'data' axis (on a dim the TP rules left unsharded). Optimizer
moments inherit the parameter shardings (``zeros_like`` preserves sharding),
so parameter + AdamW-moment memory drops ~linearly with the data-axis size;
GSPMD all-gathers each layer's weights just-in-time around its matmuls and
reduce-scatters gradients instead of all-reducing — the standard TPU
FSDP recipe, expressed purely through shardings.
"""

from typing import Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from climb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS, REPLICA_AXIS

# (path-suffix, spec) rules; first match wins. Paths are tuples of str keys.
_COL_SPLIT = {"q", "k", "v", "fc1"}  # kernel (…, in, out): shard out
_ROW_SPLIT = {"attn_out", "fc2"}     # kernel (…, in, out): shard in


# Leaves smaller than this stay replicated under FSDP (biases, LayerNorms):
# the all-gather latency would outweigh the few KB of savings.
FSDP_MIN_SIZE = 65536


def param_spec(path: Tuple[str, ...], leaf, fsdp_size: int = 0,
               pp: bool = False) -> P:
    """PartitionSpec for one parameter leaf, by its tree path.

    fsdp_size > 1 additionally shards the largest still-unsharded,
    divisible dim of every large leaf over 'data' (ZeRO-3). The scan-stacked
    layer axis (dim 0 of 3D+ kernels) is skipped so each scan iteration
    gathers slices of ONE layer, not whole other layers.

    pp=True shards the scan-stacked layer axis (dim 0 of every leaf under an
    'encoder' subtree) over 'pipe' instead — each pipeline stage holds only
    its own layers' weights, moments, and gradients; TP/FSDP rules are
    skipped for those leaves (pipeline_layers' shard_map owns their layout).
    """
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    dims = [None] * leaf.ndim
    if pp:
        # the ('data','pipe') mesh has no 'model' axis: TP rules are moot.
        # Layer-stacked leaves shard dim 0 over 'pipe' (each stage holds only
        # its own layers); everything else replicates.
        if "encoder" in names and leaf.ndim >= 1:
            dims[0] = PIPE_AXIS
            return P(*dims)
        return P()
    if len(names) >= 2 and names[-1] == "kernel":
        owner = names[-2]
        # adapters: ('...', 'adapter_mlp_task', 'down'|'up', 'kernel')
        if owner in _COL_SPLIT or owner == "down":
            dims[-1] = MODEL_AXIS
        elif owner in _ROW_SPLIT or owner == "up":
            dims[-2] = MODEL_AXIS
    if len(names) >= 2 and names[-1] == "bias" and names[-2] in _COL_SPLIT:
        dims[-1] = MODEL_AXIS
    if fsdp_size > 1 and leaf.size >= FSDP_MIN_SIZE:
        first = 1 if leaf.ndim >= 3 else 0  # skip the stacked layer axis
        cands = [d for d in range(first, leaf.ndim)
                 if dims[d] is None and leaf.shape[d] % fsdp_size == 0]
        if cands:
            dims[max(cands, key=lambda d: leaf.shape[d])] = DATA_AXIS
    if all(d is None for d in dims):  # canonical replicated form
        return P()
    return P(*dims)


def param_sharding_rules(params, mesh, fsdp: bool = False,
                         pp: bool = False) -> dict:
    """Pytree of NamedShardings matching `params`."""
    fsdp_size = mesh.shape[DATA_AXIS] if fsdp else 0
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, param_spec(path, leaf, fsdp_size, pp=pp)
        ),
        params,
    )


def shard_params(params, mesh, fsdp: bool = False, pp: bool = False):
    """Place a parameter pytree onto the mesh per the TP (+ optional FSDP)
    rules. Optimizer states created later with ``zeros_like`` inherit these
    shardings, completing the ZeRO-3 memory layout. ``pp=True`` applies the
    pipeline layout (layer-stacked leaves over 'pipe') instead.

    Multi-process: every process passes the SAME host param tree (models are
    built seed-deterministically per host); each global array is assembled
    from the full host value via make_array_from_callback, so only this
    process's addressable shards materialize on its devices."""
    rules = param_sharding_rules(params, mesh, fsdp, pp=pp)
    if jax.process_count() <= 1:
        return jax.device_put(params, rules)
    return jax.tree_util.tree_map(
        lambda x, s: jax.make_array_from_callback(
            np.shape(x), s, lambda idx, _x=x: np.asarray(_x)[idx]
        ),
        params, rules,
    )


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
    """Shard every batch leaf's leading axis across the data-parallel axes.

    Multi-process: each process passes its LOCAL batch (the per-host
    DataLoader stripe, SURVEY section 5.8); the leaves are assembled into
    global arrays whose addressable shards are this process's devices
    (global batch = local batch x process_count). Scalar/replicated leaves
    must be identical across processes."""
    if jax.process_count() <= 1:
        return jax.device_put(
            batch,
            jax.tree_util.tree_map(
                lambda x: NamedSharding(mesh, batch_spec(x, mesh)), batch
            ),
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            NamedSharding(mesh, batch_spec(x, mesh)), np.asarray(x)
        ),
        batch,
    )


def replicate(tree, mesh):
    return jax.device_put(tree, NamedSharding(mesh, P()))
