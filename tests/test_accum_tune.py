"""Portable grad-accum tuning (train/accum_tune.py): the on-device sweep,
its persistent per-(device_kind, shape) cache, the no-regression-vs-accum=1
floor, the token-budget override, and trajectory invisibility of the sweep's
throwaway timing steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.train.accum_tune import (
    AccumTuner,
    accum_candidates,
    load_cache,
    save_cache,
    shape_key,
    sweep_accum,
)
from climb_tpu.train.train_step import auto_grad_accum_for_batch


def test_accum_candidates():
    assert accum_candidates(64) == [1, 2, 4, 8, 16]
    assert accum_candidates(8) == [1, 2, 4, 8]
    assert accum_candidates(6) == [1, 2]
    assert accum_candidates(1) == [1]


def _fake_batch(bs=8, text_len=12, hw=(64, 96)):
    return {
        "input_ids": jnp.ones((bs, text_len), jnp.int32),
        "pixel_values": jnp.zeros((bs,) + hw + (3,), jnp.float32),
    }


def test_shape_key_fields():
    key = shape_key(_fake_batch(), patch_size=32)
    kind, n, b, s, f = key.split("|")
    assert n == "n1" and b == "b8" and f == "f1"
    assert s == f"s{12 + 1 + 2 * 3}"
    # fold multiplicity: multi-choice (B, C, L) text
    mc = dict(_fake_batch())
    mc["input_ids"] = jnp.ones((8, 4, 12), jnp.int32)
    assert shape_key(mc, 32).endswith("|f4")
    # topology: a single-chip pick must not be served to a mesh run at the
    # same GLOBAL batch (per-device batch differs)
    assert shape_key(_fake_batch(), 32, n_devices=8) != key


def test_sweep_picks_fastest_and_never_loses_to_accum1():
    """The sweep minimizes measured time over candidates that ALWAYS include
    accum=1 — by construction its pick is never slower than no-accum."""
    fake_times = {1: 0.5, 2: 0.3, 4: 0.9, 8: 0.7}

    def timer(step_fn, state, batch, rng):
        return fake_times[step_fn]  # step_fn stands in for its accum value

    rec = sweep_accum(lambda a: a, None, _fake_batch(), None,
                      candidates=[1, 2, 4, 8], timer=timer)
    assert rec["accum"] == 2
    assert rec["times_s"][str(rec["accum"])] <= rec["times_s"]["1"]

    with pytest.raises(AssertionError, match="accum=1"):
        sweep_accum(lambda a: a, None, _fake_batch(), None,
                    candidates=[2, 4], timer=timer)


def test_tuner_cache_roundtrip(tmp_path):
    path = str(tmp_path / "accum.json")
    save_cache({"k": {"accum": 4, "times_s": {"1": 1.0, "4": 0.5}}}, path)
    assert load_cache(path)["k"]["accum"] == 4
    assert load_cache(str(tmp_path / "missing.json")) == {}

    tuner = AccumTuner(patch_size=32, cache_path=path)
    batch = _fake_batch()
    assert tuner.get(batch) is None  # unseen shape

    calls = []

    def make(a):
        def step(state, b, rng):
            calls.append(a)
            return state, {"loss": jnp.zeros(())}

        return step

    a = tuner.tune(make, {"p": jnp.zeros(2)}, batch, jax.random.PRNGKey(0))
    assert a in accum_candidates(8)
    n_calls = len(calls)
    assert n_calls > 0

    # second tuner instance (fresh process analog) hits the persisted cache:
    # no timing calls at all
    tuner2 = AccumTuner(patch_size=32, cache_path=path)
    assert tuner2.get(batch) == a
    assert tuner2.tune(make, None, batch, None) == a
    assert len(calls) == n_calls


def test_token_budget_override_changes_pick():
    batch = {
        "input_ids": jnp.ones((8, 40), jnp.int32),
        "pixel_values": jnp.zeros((8, 64, 96, 3), jnp.float32),
    }
    # seq_len = 40 + 1 + 6 = 47; 8 seqs -> 376 tokens
    assert auto_grad_accum_for_batch(batch, 32) == 1
    assert auto_grad_accum_for_batch(batch, 32, token_budget=100) == 4
    assert auto_grad_accum_for_batch(batch, 32, token_budget=47) == 8


def test_sweep_timing_does_not_perturb_trajectory():
    """The sweep times candidate steps on COPIES of the train state (the
    step donates its first arg); the caller's optimizer trajectory must be
    bit-identical to a run without the sweep."""
    from climb_tpu.train import TrainState, make_train_step
    from climb_tpu.train.optimizer import make_optimizer
    from climb_tpu.train.trainers import LOSS_TYPES

    from tests.test_mesh_training_equivalence import (
        make_model,
        synthetic_batches,
    )

    task = "snli-ve"
    model = make_model(task)
    batches = synthetic_batches(task, n_batches=2)
    make = lambda a: make_train_step(
        model.module, task, LOSS_TYPES[task], grad_accum_steps=a
    )

    def run(with_sweep):
        params = jax.tree_util.tree_map(jnp.copy, model.params)
        tx = make_optimizer(params, lr=1e-3, total_steps=4, warmup_ratio=0.0)
        state = TrainState.create(
            apply_fn=model.module.apply, params=params, tx=tx
        )
        step = make(1)
        losses = []
        key = jax.random.PRNGKey(0)
        for i, b in enumerate(batches):
            key, sub = jax.random.split(key)
            if with_sweep and i == 0:
                sweep_accum(make, state, b, sub, candidates=[1, 2])
            state, m = step(state, b, sub)
            losses.append(float(m["loss"]))
        return losses

    np.testing.assert_array_equal(run(False), run(True))


def test_tuner_forwards_refs_and_keys_on_their_presence(tmp_path):
    """An EWC/distill run's sweep must (a) time the step WITH the production
    refs — the penalty/teacher compute is part of what's being measured, and
    omitting them would also force a retrace of the winner under the real
    treedef — and (b) cache under a refs-aware key so the plain-CE pick for
    the same shape is not reused."""
    path = str(tmp_path / "accum.json")
    batch = _fake_batch()
    seen_refs = []

    def make(a):
        def step(state, b, rng, *refs):
            seen_refs.append(refs)
            return state, {"loss": jnp.zeros(())}

        return step

    tuner = AccumTuner(32, cache_path=path)
    ewc_ref = {"fisher": jnp.ones(3)}
    assert tuner.get(batch, ewc_ref, None) is None
    a = tuner.tune(make, None, batch, None, ewc_ref, None)
    assert all(r == (ewc_ref, None) for r in seen_refs)  # refs reached the step
    assert tuner.get(batch, ewc_ref, None) == a
    # plain run (no refs) of the same shape: separate cache row
    assert tuner.get(batch) is None
    assert tuner.get(batch, None, None) is None
    assert any(k.endswith("|r10") for k in load_cache(path))


def test_tuner_config_signature_separates_cache_entries(tmp_path):
    """A pick swept under one step config must not be reused under another
    (noremat+accum always loses — CLAUDE.md): different config_sig, same
    shape -> separate cache rows."""
    path = str(tmp_path / "accum.json")
    batch = _fake_batch()

    def make(a):
        return lambda s, b, r: (s, {"loss": jnp.zeros(())})

    t1 = AccumTuner(32, cache_path=path, config_sig="bf16|remat=1:selective")
    a1 = t1.tune(make, None, batch, None)
    t2 = AccumTuner(32, cache_path=path, config_sig="f32|remat=0:full")
    assert t2.get(batch) is None  # no cross-config reuse
    t2.tune(make, None, batch, None)
    assert len(load_cache(path)) == 2

    from climb_tpu.train.accum_tune import step_config_signature
    from climb_tpu.models.model_config import ViltConfig

    sig = step_config_signature(ViltConfig(remat=True, remat_policy="selective"))
    assert "remat=1:selective" in sig and "unroll=" in sig
    assert a1 in (1, 2, 4, 8)
