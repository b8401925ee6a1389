"""Multi-host (multi-process) initialization glue.

The reference is single-process (SURVEY.md §2.10). On a TPU pod slice, one
Python process runs per host; this module wires the three pieces a multi-host
run needs:

1. ``jax.distributed.initialize()`` — joins the processes into one runtime
   so ``jax.devices()`` spans the slice and GSPMD collectives cross hosts.
2. A global mesh over all devices (``make_mesh``/``make_multislice_mesh``
   already operate on ``jax.devices()``, which is global after init).
3. Per-host input sharding — ``climb_tpu.data.loader.DataLoader`` already
   stripes the shuffled index stream by ``jax.process_index()``; nothing
   else to configure.

On TPU pods the coordinator address/process ids come from the environment,
so a bare ``initialize_distributed()`` suffices; arguments are passed through
for CPU/GPU clusters or tests.
"""

import logging

import jax

logger = logging.getLogger(__name__)


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None) -> bool:
    """Idempotent ``jax.distributed.initialize`` wrapper.

    Returns True when a multi-process runtime is active (or was already),
    False for single-process runs (init skipped or unnecessary).
    """
    # Idempotence check that must NOT touch the XLA backend:
    # jax.process_count() would initialize it, after which
    # jax.distributed.initialize() refuses to run. The distributed client
    # state is the one pre-backend signal of an active multi-process runtime.
    try:
        from jax._src.distributed import global_state

        if global_state.client is not None:
            return jax.process_count() > 1
    except ImportError:  # future jax moved the module: fall through to init
        pass
    if num_processes in (None, 0, 1) and coordinator_address is None:
        import os

        # TPU pod runtimes export cluster topology; without it (and without
        # explicit args) this is a single-process run.
        if not any(k in os.environ for k in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS")):
            return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return jax.process_count() > 1
