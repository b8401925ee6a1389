"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (DP/TP/SP collectives) is validated without TPU hardware
via XLA's forced host-platform device count; the driver separately dry-runs
the multi-chip path (see ``__graft_entry__.dryrun_multichip``) and benches on
a real chip.

Note: the environment may pre-register a TPU backend at interpreter startup
(sitecustomize), so the platform is forced to CPU via ``jax.config`` rather
than env vars — this works as long as no backend has been initialized yet.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_mesh():
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8


# Fast broad-coverage subset: `pytest -m smoke` finishes in ~2-3 min on this
# 1-core VM (vs ~27 min for the full suite) — one module per subsystem, all
# pure-numpy or tiny-model tests.
_SMOKE_MODULES = {
    "test_utils.py",            # score/forgetting/normalize formulas
    "test_loader.py",           # loader + prefetch + failure semantics
    "test_cl_algorithms.py",    # ER/EWC/freeze math + host sharding
    "test_processor.py",        # AOT input processor + converters
    "test_optimizer.py",        # AdamW groups, schedule, masks
    "test_sharding.py",         # DP/TP mesh equivalence (8-dev CPU)
    "test_surgery.py",          # pytree surgeries
    "test_multipass_equivalence.py",  # NLVR2/VCR fold == sequential
    "test_raw_input.py",        # visual_input_type raw == on-device normalize
    "test_driver_smoke.py",     # ONE end-to-end driver run (train+eval+resume)
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.fspath.basename in _SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)
