"""Multi-chip sharding on the virtual 8-device CPU mesh: DP+TP train step
compiles + executes, and parameters land with the intended partition specs."""

import numpy as np

import jax
from jax.sharding import PartitionSpec as P

from climb_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from climb_tpu.parallel.sharding import param_sharding_rules


def test_mesh_shapes():
    mesh = make_mesh(n_data=4, n_model=2)
    assert mesh.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}


def test_param_partition_specs():
    mesh = make_mesh(n_data=4, n_model=2)
    params = {
        "vilt": {
            "encoder": {
                "q": {"kernel": np.zeros((2, 8, 8)), "bias": np.zeros((2, 8))},
                "attn_out": {"kernel": np.zeros((2, 8, 8)), "bias": np.zeros((2, 8))},
                "fc1": {"kernel": np.zeros((2, 8, 16)), "bias": np.zeros((2, 16))},
                "fc2": {"kernel": np.zeros((2, 16, 8)), "bias": np.zeros((2, 8))},
                "ln1": {"scale": np.zeros((2, 8)), "bias": np.zeros((2, 8))},
            },
            "word_embeddings": np.zeros((32, 8)),
        }
    }
    shardings = param_sharding_rules(params, mesh)
    enc = shardings["vilt"]["encoder"]
    assert enc["q"]["kernel"].spec == P(None, None, MODEL_AXIS)
    assert enc["q"]["bias"].spec == P(None, MODEL_AXIS)
    assert enc["attn_out"]["kernel"].spec == P(None, MODEL_AXIS, None)
    assert enc["fc1"]["kernel"].spec == P(None, None, MODEL_AXIS)
    assert enc["fc2"]["kernel"].spec == P(None, MODEL_AXIS, None)
    assert enc["ln1"]["scale"].spec == P()
    assert shardings["vilt"]["word_embeddings"].spec == P()


def test_dryrun_multichip_8dev():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_dp_tp_matches_single_device():
    """The sharded train step must produce the same loss as unsharded."""
    from types import SimpleNamespace

    import jax.numpy as jnp

    from climb_tpu.configs import task_configs
    from climb_tpu.parallel.sharding import shard_batch, shard_params
    from climb_tpu.train import TrainState, create_cl_model, make_train_step
    from climb_tpu.train.optimizer import make_optimizer

    args = SimpleNamespace(
        batch_size=8, seed=0, ordered_cl_tasks=["snli-ve"], encoder_name="vilt",
        pretrained_vilt_name="scratch", tiny=True, synthetic=True,
    )
    model = create_cl_model(args, task_configs)
    cfg = model.cfg
    rng = np.random.RandomState(0)
    b = 8
    batch_np = {
        "input_ids": rng.randint(1, 100, (b, cfg.max_text_len)).astype(np.int32),
        "text_mask": np.ones((b, cfg.max_text_len), np.float32),
        "pixel_values": rng.randint(0, 255, (b, cfg.image_height, cfg.image_width, 3)).astype(np.uint8),
        "patch_hw": np.tile([[cfg.grid_h, cfg.grid_w]], (b, 1)).astype(np.int32),
        "labels": rng.randint(0, 3, (b,)).astype(np.int32),
    }

    def run(mesh):
        # copy: the train step donates its state, which would consume
        # model.params on the first run
        params = jax.tree_util.tree_map(jnp.array, model.params)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        if mesh is not None:
            params = shard_params(params, mesh)
            batch = shard_batch(batch, mesh)
        tx = make_optimizer(params, lr=1e-4, total_steps=10)
        state = TrainState.create(apply_fn=model.module.apply, params=params, tx=tx)
        step = make_train_step(model.module, "snli-ve", "ce")
        state, m = step(state, batch, jax.random.PRNGKey(1))
        return float(m["loss"]), float(m["metric_sum"])

    loss_1, acc_1 = run(None)
    loss_8, acc_8 = run(make_mesh(n_data=4, n_model=2))
    np.testing.assert_allclose(loss_8, loss_1, rtol=1e-5)
    np.testing.assert_allclose(acc_8, acc_1, rtol=1e-6)
