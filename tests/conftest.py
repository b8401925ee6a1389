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
