"""Pipeline parallelism over the stacked (scanned) layer axis.

The reference has no pipeline parallelism (SURVEY.md section 2.10 — it is
single-device); at ViLT-base scale PP is not *needed*, so the survey's design
target is a stage-partitioning capability on the layer-stacked encoder. This
module provides it TPU-natively:

- Encoder blocks are already nn.scan-stacked: every per-layer parameter leaf
  carries a leading (num_layers,) axis. Pipeline stages are therefore just a
  reshape of that axis to (n_stages, layers_per_stage) plus a sharding of the
  stage axis over a 'pipe' mesh axis.
- The schedule is GPipe: the global batch splits into microbatches that
  stream through the stages; stage-to-stage handoff is a single
  ``lax.ppermute`` hop over the ICI ring (neighbor transfer, no all-to-all).
  With M microbatches and P stages the pipeline runs M + P - 1 ticks with a
  (P-1)/(M+P-1) bubble.
- Everything is expressed with ``shard_map`` + ``lax.scan`` over ticks, so
  ``jax.grad`` differentiates straight through the schedule (ppermute's
  transpose is the reverse ppermute) — the same function serves forward
  and training.

The per-stage inner loop over the stage's own layers is a ``lax.scan``, i.e.
exactly the sequential layer stack, which makes the pipeline output
bit-comparable to the unpipelined encoder (tests/test_pipeline.py asserts
equality).
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=False)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _esm

    def shard_map(f, mesh, in_specs, out_specs):
        return _esm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                    check_rep=False)

PIPE_AXIS = "pipe"


def make_pipe_mesh(n_stages: int, devices=None) -> Mesh:
    """A 1-D ('pipe',) mesh. jax.devices() order is ICI-contiguous on TPU, so
    consecutive stages are ICI neighbors and each ppermute hop is one link."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())[:n_stages]
    return Mesh(np.asarray(devices), (PIPE_AXIS,))


def shard_stacked_params(stacked_params, mesh: Mesh, axis: str = PIPE_AXIS):
    """Place layer-stacked params (leading (L,) axis per leaf) with the layer
    axis sharded over the pipe axis — each stage holds only its own layers."""
    return jax.device_put(
        stacked_params,
        jax.tree_util.tree_map(
            lambda x: NamedSharding(mesh, P(*([axis] + [None] * (x.ndim - 1)))),
            stacked_params,
        ),
    )


def pipeline_layers(
    block_fn: Callable,
    stacked_params,
    inputs,
    n_micro: int,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    batch_axis: str = None,
):
    """Apply L stacked layers to a batch, pipelined over `axis` of `mesh`.

    block_fn(layer_params, inputs_pytree) -> inputs_pytree
        one layer's computation; must return the same pytree structure
        (per-sample side inputs like attention-mask biases ride along
        unchanged so they travel with their microbatch through the stages).
    stacked_params: pytree, every leaf with leading axis L (L % n_stages == 0).
    inputs: pytree of arrays with a common leading batch axis B
        (B % n_micro == 0).
    batch_axis: optional second mesh axis to shard the batch over — composes
        data parallelism with the pipeline on a 2-D ('data', 'pipe') mesh:
        every data slice runs its own GPipe schedule on its batch shard
        (params are replicated across 'data' and stage-sharded across 'pipe').

    Returns the same pytree with every layer applied, equal to the sequential
    ``lax.scan`` over all L layers.
    """
    n_stages = mesh.shape[axis]
    batch = jax.tree_util.tree_leaves(inputs)[0].shape[0]
    if batch_axis is not None:
        n_data = mesh.shape[batch_axis]
        assert batch % n_data == 0, f"batch {batch} % {batch_axis}={n_data} != 0"
        batch = batch // n_data  # per-slice batch below
    assert batch % n_micro == 0, f"batch {batch} % n_micro {n_micro} != 0"
    mb = batch // n_micro
    n_ticks = n_micro + n_stages - 1

    param_specs = jax.tree_util.tree_map(
        lambda x: P(*([axis] + [None] * (x.ndim - 1))), stacked_params
    )
    batch_spec = lambda x: P(*([batch_axis] + [None] * (x.ndim - 1)))
    in_specs = jax.tree_util.tree_map(batch_spec, inputs)
    out_specs = jax.tree_util.tree_map(batch_spec, inputs)

    def stage_apply(local_params, state):
        def body(h, lp):
            return block_fn(lp, h), None

        out, _ = jax.lax.scan(body, state, local_params)
        return out

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, in_specs),
        out_specs=out_specs,
    )
    def run(local_params, inputs):
        stage = jax.lax.axis_index(axis)
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((n_micro, mb) + x.shape[1:]), inputs
        )
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(carry, t):
            state, out = carry
            # stage 0 injects microbatch t (clamped; ticks past n_micro feed
            # a don't-care repeat that never reaches the output slots)
            inj = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(
                    x, jnp.minimum(t, n_micro - 1), 0, keepdims=False
                ),
                micro,
            )
            state = jax.tree_util.tree_map(
                lambda i, s: jnp.where(stage == 0, i, s), inj, state
            )
            y = stage_apply(local_params, state)
            # collect every tick; slots [n_stages-1:] hold the real outputs
            out = jax.tree_util.tree_map(
                lambda o, v: jax.lax.dynamic_update_index_in_dim(o, v, t, 0),
                out,
                y,
            )
            # hand off to the next stage over the ICI ring
            state = jax.tree_util.tree_map(
                lambda v: jax.lax.ppermute(v, axis, perm), y
            )
            return (state, out), None

        zeros_state = jax.tree_util.tree_map(
            lambda x: jnp.zeros((mb,) + x.shape[1:], x.dtype), inputs
        )
        out0 = jax.tree_util.tree_map(
            lambda x: jnp.zeros((n_ticks, mb) + x.shape[1:], x.dtype), inputs
        )
        (_, out), _ = jax.lax.scan(
            tick, (zeros_state, out0), jnp.arange(n_ticks)
        )
        # keep the completed slots, un-microbatch, and broadcast the last
        # stage's result to every device (masked psum over the pipe axis)
        result = jax.tree_util.tree_map(
            lambda o: o[n_stages - 1 :].reshape((batch,) + o.shape[2:]), out
        )
        on_last = (stage == n_stages - 1).astype(jnp.float32)
        result = jax.tree_util.tree_map(
            lambda r: jax.lax.psum(r * on_last.astype(r.dtype), axis), result
        )
        return result

    return run(stacked_params, inputs)
