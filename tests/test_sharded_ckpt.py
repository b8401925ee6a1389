"""Sharded checkpointing (ckpt/sharded.py): each process writes only its
addressable unique shards; restore reassembles ANY requested sharding from
the chunk manifest — including onto a different mesh than the save used.
"""

import os
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.ckpt import (
    is_sharded_checkpoint,
    load_params,
    load_sharded,
    save_sharded,
    save_task_checkpoint,
    task_checkpoint_exists,
)
from climb_tpu.parallel.mesh import make_mesh
from climb_tpu.parallel.sharding import param_sharding_rules, shard_params


def _tree_allclose(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_array_equal(
            np.asarray(x).astype(np.float32), np.asarray(y).astype(np.float32)
        )


def _demo_tree(rng=0):
    r = np.random.RandomState(rng)
    # 'kernel' and 'stacked' exceed FSDP_MIN_SIZE (65536) so FSDP really
    # shards them (multi-chunk save path); 'bias'/'w' stay replicated
    return {
        "enc": {
            "kernel": jnp.asarray(r.randn(256, 512), jnp.float32),
            "bias": jnp.asarray(r.randn(64), jnp.float32),
            "stacked": jnp.asarray(r.randn(4, 64, 256), jnp.float32),
        },
        "head": {"w": jnp.asarray(r.randn(64, 8), jnp.float32)},
    }


@pytest.mark.smoke
def test_fsdp_save_host_restore(tmp_path):
    """Save an FSDP-sharded tree (unique-shard dedup), restore as plain host
    numpy, compare exactly."""
    tree = _demo_tree()
    mesh = make_mesh(n_data=4, n_model=2)
    sharded_tree = shard_params(tree, mesh, fsdp=True)
    d = str(tmp_path / "ckpt")
    save_sharded(sharded_tree, d, meta={"step": 7})

    assert is_sharded_checkpoint(d)
    restored, meta = load_sharded(d)
    assert meta == {"step": 7}
    _tree_allclose(restored, tree)


def test_restore_onto_different_mesh(tmp_path):
    """A checkpoint saved under one mesh/partitioning restores under another:
    save on (4 data x 2 model) FSDP, restore onto (8 data x 1 model) FSDP and
    onto plain replicated DP — values equal, requested shardings honored."""
    tree = _demo_tree(1)
    save_mesh = make_mesh(n_data=4, n_model=2)
    d = str(tmp_path / "ckpt")
    save_sharded(shard_params(tree, save_mesh, fsdp=True), d)

    for n_data, n_model, fsdp in ((8, 1, True), (4, 2, False)):
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        rules = param_sharding_rules(tree, mesh, fsdp=fsdp)
        restored, _ = load_sharded(d, shardings=rules)
        _tree_allclose(restored, tree)
        flat_r = jax.tree_util.tree_leaves(restored)
        flat_s = jax.tree_util.tree_leaves(
            rules, is_leaf=lambda x: isinstance(x, jax.sharding.Sharding)
        )
        for arr, want in zip(flat_r, flat_s):
            assert arr.sharding == want, (arr.sharding, want)


def test_nonnative_dtypes_and_scalars(tmp_path):
    """bf16 leaves (no native np.save support) and 0-d leaves round-trip."""
    tree = {
        "w": jnp.asarray(np.random.RandomState(0).randn(8, 8), jnp.bfloat16),
        "step": jnp.asarray(41, jnp.int32),
        "b": jnp.asarray([1.5, -2.0], jnp.float32),
    }
    d = str(tmp_path / "ckpt")
    save_sharded(tree, d)
    restored, _ = load_sharded(d)
    assert np.dtype(restored["w"].dtype) == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(restored["w"]).astype(np.float32),
        np.asarray(tree["w"]).astype(np.float32),
    )
    assert int(restored["step"]) == 41
    np.testing.assert_array_equal(restored["b"], np.asarray(tree["b"]))


def test_task_checkpoint_sharded_autodetected(tmp_path):
    """save_task_checkpoint(sharded=True) writes directories that every
    reader path (exists-check, load_params) resolves transparently."""
    params = {"vilt": _demo_tree(2), "head_snli_ve": {"w": jnp.ones((4, 3))}}
    out = str(tmp_path / "run")
    save_task_checkpoint(out, 0, "snli-ve", params, encoder_key="vilt",
                         sharded=True)
    assert task_checkpoint_exists(out, 0, "snli-ve")
    model_dir = os.path.join(out, "checkpoints", "task0_snli-ve", "model")
    assert is_sharded_checkpoint(model_dir)
    _tree_allclose(load_params(model_dir), params)
    enc_dir = os.path.join(out, "checkpoints", "task0_snli-ve", "encoder")
    _tree_allclose(load_params(enc_dir), params["vilt"])


def test_sharded_elastic_resume_matches_msgpack(tmp_path):
    """--sharded_checkpoints changes the elastic state's on-disk layout
    (directory of shard chunks), not the trajectory: an interrupted run
    resumed from a sharded train_state reproduces the msgpack run exactly."""
    from climb_tpu.configs import task_configs
    from climb_tpu.train import create_cl_model
    from tests.test_elastic_resume import _Boom, _make_trainer, make_args

    sync_dir, sh_dir = tmp_path / "sync", tmp_path / "sharded"
    sync_dir.mkdir(), sh_dir.mkdir()

    args = make_args(sync_dir)
    model = create_cl_model(args, task_configs)
    score_sync, model_sync = _make_trainer(args).train(model)

    args2 = make_args(sh_dir, sharded_checkpoints=True)
    model2 = create_cl_model(args2, task_configs)
    trainer2 = _make_trainer(args2)
    orig_eval = type(trainer2).eval
    calls = {"n": 0}

    def dying_eval(self, params, m):
        calls["n"] += 1
        if calls["n"] == 3:
            raise _Boom()
        return orig_eval(self, params, m)

    type(trainer2).eval = dying_eval
    try:
        with pytest.raises(_Boom):
            trainer2.train(model2)
    finally:
        type(trainer2).eval = orig_eval
    assert is_sharded_checkpoint(str(sh_dir / "train_state"))

    model3 = create_cl_model(args2, task_configs)
    score_sh, model_res = _make_trainer(args2).train(model3)
    assert score_sh == pytest.approx(score_sync, abs=1e-6)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        model_sync.params,
        model_res.params,
    )
    # completed run cleans its elastic state dir like the msgpack file
    assert not (sh_dir / "train_state").exists()


def test_incomplete_checkpoint_detected(tmp_path):
    """A manifest pointing at missing element coverage (e.g. a lost shard
    file from another process) fails loudly, not with silent garbage."""
    tree = _demo_tree(3)
    mesh = make_mesh(n_data=8, n_model=1)
    d = str(tmp_path / "ckpt")
    sharded_tree = shard_params(tree, mesh, fsdp=True)
    # precondition: FSDP really split this leaf into multiple chunks
    assert not sharded_tree["enc"]["kernel"].sharding.is_fully_replicated
    save_sharded(sharded_tree, d)
    # simulate a lost process shard: drop half the chunks from the manifest
    import json

    mpath = os.path.join(d, "manifest-0.json")
    with open(mpath) as f:
        m = json.load(f)
    key = "enc/kernel"
    m["leaves"][key]["chunks"] = m["leaves"][key]["chunks"][:1]
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="incomplete"):
        load_sharded(d)
