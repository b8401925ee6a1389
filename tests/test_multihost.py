"""Multi-process (multi-host) runtime regression: 2 REAL OS processes join
via jax.distributed + gloo CPU collectives and run one DP step on a global
batch assembled from per-host DataLoader stripes (SURVEY.md §2.10 / §5.8
comm backend; reference is single-process). The heavy lifting lives in
``__graft_entry__.dryrun_multihost`` so the driver's multichip dryrun and
this test exercise the identical path."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_two_process_dp_step_with_host_striping():
    import __graft_entry__ as g

    token = g.dryrun_multihost(2, devices_per_process=2)
    assert token.startswith("multihost=2proc ok"), token
    assert "disjoint per-host stripes" in token


def test_initialize_distributed_noop_without_cluster_env(monkeypatch):
    """Single-process runs (no pod topology env, no explicit args) skip
    jax.distributed entirely and report inactive."""
    from climb_tpu.parallel.distributed import initialize_distributed

    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    assert initialize_distributed() is False


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
