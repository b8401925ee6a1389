"""Pipeline parallelism over the stacked (scanned) layer axis.

The reference has no pipeline parallelism (SURVEY.md section 2.10 — it is
single-device); at ViLT-base scale PP is not *needed*, so the survey's design
target is a stage-partitioning capability on the layer-stacked encoder. This
module provides it TPU-natively:

- Encoder blocks are already nn.scan-stacked: every per-layer parameter leaf
  carries a leading (num_layers,) axis. Pipeline stages are therefore just a
  reshape of that axis to (n_stages, layers_per_stage) plus a sharding of the
  stage axis over a 'pipe' mesh axis.
- The schedule is GPipe generalized with circular/interleaved virtual
  stages (the Megatron-LM "interleaved 1F1B" placement, TPU-natively): the
  global batch splits into microbatches that stream through the stages;
  stage-to-stage handoff is a single ``lax.ppermute`` hop over the ICI ring
  (neighbor transfer, no all-to-all). With M microbatches, P stages, and
  ``n_virtual=V`` layer chunks per device (virtual stage s = layers chunk s,
  placed on device s mod P), a microbatch circles the ring V times; each
  tick costs L/(V*P) layers instead of L/P, so the pipeline fill/drain
  bubble shrinks V-fold: ceil(M/P)*V*P + P - 1 ticks at 1/V the tick cost
  vs (M + P - 1) full-cost ticks for GPipe — bubble fraction
  (P-1)/(V*M + P-1) instead of (P-1)/(M + P-1) at M % P == 0.
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

from climb_tpu.parallel.mesh import PIPE_AXIS  # the mesh axis PP rides


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


def pipeline_schedule(n_micro: int, n_stages: int, n_virtual: int = 1):
    """Static per-tick tables for the (circular) pipeline schedule.

    Returns (n_ticks, tables) where tables holds int32/bool numpy arrays of
    length n_ticks: ``t`` (tick), ``inj_idx``/``inj_ok`` (microbatch device 0
    injects this tick, if any) and ``out_idx``/``out_ok`` (microbatch whose
    final output device P-1 produces this tick, if any). Microbatch j is
    injected at tick (j // P) * V*P + j % P and completes V*P - 1 ticks
    later; see :func:`pipeline_layers` for the collision-freedom argument.
    """
    import numpy as np

    M, VP = n_micro, n_virtual * n_stages
    tau_last = (M - 1) // n_stages * VP + (M - 1) % n_stages
    n_ticks = tau_last + VP
    t_arr = np.arange(n_ticks)
    inj_raw = (t_arr // VP) * n_stages + (t_arr % VP)
    inj_ok = ((t_arr % VP) < n_stages) & (inj_raw < M)
    tau_out = t_arr - VP + 1
    out_raw = (tau_out // VP) * n_stages + (tau_out % VP)
    out_ok = (tau_out >= 0) & ((tau_out % VP) < n_stages) & (out_raw < M)
    return n_ticks, {
        "t": t_arr.astype(np.int32),
        "inj_idx": np.clip(inj_raw, 0, M - 1).astype(np.int32),
        "inj_ok": inj_ok,
        "out_idx": np.clip(out_raw, 0, M - 1).astype(np.int32),
        "out_ok": out_ok,
    }


def interleave_for_pipeline(stacked_params, n_stages: int, n_virtual: int):
    """Reorder the stacked (L,) layer axis into the circular-schedule layout.

    Execution order assigns virtual stage s = layer_chunk s (chunk size
    L/(n_stages*n_virtual)) to device s % n_stages; sharding the leading
    axis contiguously over the pipe axis therefore needs a device-major
    layout: device d's rows are the chunks of stages {d, P+d, 2P+d, ...} in
    round order.

    Two usage modes:
    - Long-lived stacks you control end-to-end: apply ONCE and keep the
      params stored interleaved — zero per-step cost.
    - The trainer path (ViltCore.pipeline_encode) deliberately keeps stored
      params CANONICAL — checkpoints, freeze masks, EWC/adapter trees, and
      HF grafting all stay pipeline-agnostic — and pays this reorder inside
      the jitted step instead: one gather of the layer-stacked tree forward
      + its scatter-add transpose backward per step (~2x stacked-tree bytes
      over ICI; small vs a training step, quantified in docs/SCALING.md).
      tests/test_pp_training.py pins the trajectory equivalence."""
    if n_virtual <= 1:
        return stacked_params
    import numpy as np

    def reorder(x):
        total = x.shape[0]
        assert total % (n_stages * n_virtual) == 0, (
            f"L={total} not divisible by stages*virtual="
            f"{n_stages * n_virtual}"
        )
        lc = total // (n_stages * n_virtual)
        idx = np.concatenate(
            [
                np.arange((v * n_stages + d) * lc, (v * n_stages + d + 1) * lc)
                for d in range(n_stages)
                for v in range(n_virtual)
            ]
        )
        return jnp.take(x, jnp.asarray(idx), axis=0)

    return jax.tree_util.tree_map(reorder, stacked_params)


def pipeline_layers(
    block_fn: Callable,
    stacked_params,
    inputs,
    n_micro: int,
    mesh: Mesh,
    axis: str = PIPE_AXIS,
    batch_axis: str = None,
    n_virtual: int = 1,
):
    """Apply L stacked layers to a batch, pipelined over `axis` of `mesh`.

    block_fn(layer_params, inputs_pytree) -> inputs_pytree
        one layer's computation; must return the same pytree structure
        (per-sample side inputs like attention-mask biases ride along
        unchanged so they travel with their microbatch through the stages).
    stacked_params: pytree, every leaf with leading axis L
        (L % (n_stages * n_virtual) == 0). For ``n_virtual > 1`` the layer
        axis must already be in the device-major circular layout — see
        :func:`interleave_for_pipeline`.
    inputs: pytree of arrays with a common leading batch axis B
        (B % n_micro == 0).
    batch_axis: optional second mesh axis to shard the batch over — composes
        data parallelism with the pipeline on a 2-D ('data', 'pipe') mesh:
        every data slice runs its own schedule on its batch shard
        (params are replicated across 'data' and stage-sharded across 'pipe').
    n_virtual: layer chunks per device (circular/interleaved schedule).
        V=1 is plain GPipe: M + P - 1 ticks of L/P layers each. V>1 sends
        every microbatch around the ICI ring V times applying one L/(V*P)
        chunk per hop, shrinking the fill/drain bubble V-fold:
        ceil(M/P)*V*P + P - 1 ticks of L/(V*P) layers (bubble fraction
        (P-1)/(V*M + P-1) at M % P == 0, vs GPipe's (P-1)/(M + P-1)).

    Returns the same pytree with every layer applied, equal to the sequential
    ``lax.scan`` over all L layers.

    Schedule derivation (why one in-flight state per device suffices):
    microbatch j = w*P + m (w-th wave of P) is injected on device 0 at tick
    tau_j = w*V*P + m and moves one ppermute hop per tick; after k hops it
    sits on device k mod P having applied k chunks, the next being chunk
    floor(k/P) of that device. Two microbatches colliding on a device at one
    tick would need tau_j1 ≡ tau_j2 (mod P) with |tau_j1 - tau_j2| < V*P and
    j1 != j2 — impossible since m < P and waves are V*P apart. The chunk a
    device d runs at tick t is c = ((t - d) mod V*P) // P, and outputs
    complete on device P-1 at ticks tau_j + V*P - 1.
    """
    import numpy as np

    n_stages = mesh.shape[axis]
    V = int(n_virtual)
    VP = V * n_stages
    batch = jax.tree_util.tree_leaves(inputs)[0].shape[0]
    if batch_axis is not None:
        n_data = mesh.shape[batch_axis]
        assert batch % n_data == 0, f"batch {batch} % {batch_axis}={n_data} != 0"
        batch = batch // n_data  # per-slice batch below
    assert batch % n_micro == 0, f"batch {batch} % n_micro {n_micro} != 0"
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    assert n_layers % VP == 0, (
        f"L={n_layers} % (stages*virtual)={VP} != 0"
    )
    lc = n_layers // VP
    mb = batch // n_micro
    M = n_micro

    # Static per-tick schedule tables (host-computed; scanned as xs).
    n_ticks, sched = pipeline_schedule(M, n_stages, V)
    xs = {k: jnp.asarray(v) for k, v in sched.items()}

    param_specs = jax.tree_util.tree_map(
        lambda x: P(*([axis] + [None] * (x.ndim - 1))), stacked_params
    )
    batch_spec = lambda x: P(*([batch_axis] + [None] * (x.ndim - 1)))
    in_specs = jax.tree_util.tree_map(batch_spec, inputs)
    out_specs = jax.tree_util.tree_map(batch_spec, inputs)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, in_specs),
        out_specs=out_specs,
    )
    def run(local_params, inputs):
        stage = jax.lax.axis_index(axis)
        # (V*lc, ...) local rows -> (V, lc, ...): chunk v = round-v layers
        local = jax.tree_util.tree_map(
            lambda x: x.reshape((V, lc) + x.shape[1:]), local_params
        )
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape((n_micro, mb) + x.shape[1:]), inputs
        )
        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def stage_apply(c, state):
            chunk = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, c, 0, keepdims=False),
                local,
            )

            def body(h, lp):
                return block_fn(lp, h), None

            out, _ = jax.lax.scan(body, state, chunk)
            return out

        def tick(carry, x):
            state, out = carry
            # stage 0 injects the scheduled microbatch on injection ticks
            inj = jax.tree_util.tree_map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, x["inj_idx"], 0, keepdims=False
                ),
                micro,
            )
            do_inject = jnp.logical_and(stage == 0, x["inj_ok"])
            state = jax.tree_util.tree_map(
                lambda i, s: jnp.where(do_inject, i, s), inj, state
            )
            y = stage_apply(((x["t"] - stage) % VP) // n_stages, state)
            # masked write into the M-slot output buffer (only the last
            # stage's completed slots survive the psum below)
            out = jax.tree_util.tree_map(
                lambda o, v: jax.lax.dynamic_update_index_in_dim(
                    o,
                    jnp.where(
                        x["out_ok"],
                        v,
                        jax.lax.dynamic_index_in_dim(
                            o, x["out_idx"], 0, keepdims=False
                        ),
                    ),
                    x["out_idx"],
                    0,
                ),
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
            lambda x: jnp.zeros((n_micro, mb) + x.shape[1:], x.dtype), inputs
        )
        (_, out), _ = jax.lax.scan(tick, (zeros_state, out0), xs)
        # un-microbatch and broadcast the last stage's result to every
        # device (masked psum over the pipe axis)
        result = jax.tree_util.tree_map(
            lambda o: o.reshape((batch,) + o.shape[2:]), out
        )
        on_last = (stage == n_stages - 1).astype(jnp.float32)
        result = jax.tree_util.tree_map(
            lambda r: jax.lax.psum(r * on_last.astype(r.dtype), axis), result
        )
        return result

    return run(stacked_params, inputs)
