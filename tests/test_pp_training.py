"""Pipeline parallelism wired into the TRAINER path (not just the primitive):
a model built with --pp_stages trains through pipeline_layers and reproduces
the single-device trajectory (VERDICT r2 item 3).

The reference is single-device (SURVEY.md section 2.10); PP is a TPU-native
scaling capability on the scan-stacked encoder. tests/test_pipeline.py covers
the primitive; this file covers the integration: ViltConfig.pp_* routing in
ViltCore, the 'pipe' param shardings, the ('data','pipe') mesh, the driver
flag surface, and checkpoint-layout invariance.
"""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.configs import task_configs
from climb_tpu.parallel.mesh import PIPE_AXIS, make_dp_pp_mesh
from climb_tpu.parallel.sharding import shard_batch, shard_params
from climb_tpu.train import TrainState, create_cl_model, make_train_step
from climb_tpu.train.model_factory import vilt_config_from_args
from climb_tpu.train.optimizer import make_optimizer
from climb_tpu.train.trainers import LOSS_TYPES

from tests.test_mesh_training_equivalence import make_model, synthetic_batches

CANVAS = (64, 96)


def make_pp_model(task_key, pp_stages=2, pp_virtual=1, pp_microbatches=0,
                  encoder_name="vilt"):
    args = SimpleNamespace(
        batch_size=8, seed=0, ordered_cl_tasks=[task_key],
        encoder_name=encoder_name, pretrained_model_name="scratch", tiny=True,
        synthetic=True, image_height=CANVAS[0], image_width=CANVAS[1],
        pp_stages=pp_stages, pp_virtual=pp_virtual,
        pp_microbatches=pp_microbatches,
    )
    return create_cl_model(args, task_configs)


def run_pp_trajectory(model, task_key, batches, n_steps_total=10):
    params = model.params  # already pipe-sharded by create_cl_model
    bs = [shard_batch(b, model.mesh) for b in batches]
    tx = make_optimizer(params, lr=1e-3, total_steps=n_steps_total,
                        warmup_ratio=0.0, trainable_mask=model.trainable_mask)
    state = TrainState.create(apply_fn=model.module.apply, params=params, tx=tx)
    step = make_train_step(model.module, task_key, LOSS_TYPES[task_key])
    losses = []
    key = jax.random.PRNGKey(0)
    for b in bs:
        key, sub = jax.random.split(key)
        state, m = step(state, b, sub)
        losses.append(float(m["loss"]))
    return losses, state


def run_single_trajectory(task_key, batches, n_steps_total=10):
    return run_single_from(make_model(task_key), task_key, batches,
                           n_steps_total)


def run_single_from(model, task_key, batches, n_steps_total=10):
    tx = make_optimizer(model.params, lr=1e-3, total_steps=n_steps_total,
                        warmup_ratio=0.0, trainable_mask=model.trainable_mask)
    state = TrainState.create(apply_fn=model.module.apply, params=model.params,
                              tx=tx)
    step = make_train_step(model.module, task_key, LOSS_TYPES[task_key])
    losses = []
    key = jax.random.PRNGKey(0)
    for b in batches:
        key, sub = jax.random.split(key)
        state, m = step(state, b, sub)
        losses.append(float(m["loss"]))
    return losses, state


@pytest.mark.parametrize("task_key", ["snli-ve", "vqa"])
def test_pp_trajectory_matches_single_device(task_key):
    """DP(4) x PP(2) training == single-device, including the VQA-BCE loss.
    Same seeds/batches; the pipeline must be trajectory-invisible."""
    batches = synthetic_batches(task_key)
    single, _ = run_single_trajectory(task_key, batches)
    assert all(np.isfinite(single)), single
    assert single[0] != single[-1], "trajectory is not training"

    model = make_pp_model(task_key, pp_stages=2)
    assert model.mesh.shape == {"data": 4, PIPE_AXIS: 2}
    pp, state = run_pp_trajectory(model, task_key, batches)
    np.testing.assert_allclose(pp, single, rtol=2e-4)

    # the encoder's stacked leaves (and their AdamW moments) really live
    # pipe-sharded: each stage holds only its own layers
    def pipe_sharded_leaves(tree):
        n = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            spec = getattr(getattr(leaf, "sharding", None), "spec", ())
            if any(PIPE_AXIS in (ax if isinstance(ax, tuple) else (ax,))
                   for ax in spec if ax is not None):
                n += 1
        return n

    assert pipe_sharded_leaves(state.params) > 0
    assert pipe_sharded_leaves(state.opt_state) > 0


def test_pp_viltbert_trajectory_matches():
    """The second encoder family under PP: the nested {bert, vilt} tree —
    the ViLT side pipelines, the frozen BERT side's stacked leaves are
    pipe-sharded annotations on its plain scan (GSPMD handles the gathers),
    and the frozen-BERT trainability mask still applies."""
    task_key = "snli-ve"
    batches = synthetic_batches(task_key, n_batches=2)

    model_single = make_model(task_key, encoder_name="viltbert")
    single, _ = run_single_from(model_single, task_key, batches)

    model = make_pp_model(task_key, pp_stages=2, encoder_name="viltbert")
    pp, _ = run_pp_trajectory(model, task_key, batches)
    np.testing.assert_allclose(pp, single, rtol=2e-4)


def test_pp_virtual_trainer_trajectory_matches_single_device():
    """The circular/interleaved schedule (pp_virtual=2) through the TRAINER
    path — including the per-apply canonical->interleaved param gather that
    keeps stored params checkpoint-canonical — must reproduce the
    single-device trajectory. 4 layers so L % (stages*virtual) == 0."""
    task_key = "snli-ve"
    batches = synthetic_batches(task_key, n_batches=2)

    base_args = dict(
        batch_size=8, seed=0, ordered_cl_tasks=[task_key],
        encoder_name="vilt", pretrained_model_name="scratch", tiny=True,
        num_layers=4, synthetic=True, image_height=CANVAS[0],
        image_width=CANVAS[1],
    )
    single_model = create_cl_model(SimpleNamespace(**base_args), task_configs)
    model = create_cl_model(
        SimpleNamespace(**base_args, pp_stages=2, pp_virtual=2,
                        pp_microbatches=2),
        task_configs,
    )
    assert model.cfg.num_layers == 4 and model.cfg.pp_virtual == 2
    # stored params stay canonical even under the interleaved schedule
    # (host copies up front: the train steps donate the device buffers)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(single_model.params), jax.device_get(model.params),
    )

    single, _ = run_single_from(single_model, task_key, batches)
    assert all(np.isfinite(single)), single
    pp, _ = run_pp_trajectory(model, task_key, batches)
    np.testing.assert_allclose(pp, single, rtol=2e-4)


def test_pp_pure_pipeline_no_data_axis():
    """A pipe-only mesh (data axis size 1): the batch_axis=None path."""
    task_key = "snli-ve"
    batches = synthetic_batches(task_key, n_batches=2)
    single, _ = run_single_trajectory(task_key, batches)

    mesh = make_dp_pp_mesh(2, devices=jax.devices()[:2])
    args = SimpleNamespace(
        batch_size=8, seed=0, ordered_cl_tasks=[task_key],
        encoder_name="vilt", pretrained_model_name="scratch", tiny=True,
        synthetic=True, image_height=CANVAS[0], image_width=CANVAS[1],
        pp_stages=2,
    )
    model = create_cl_model(args, task_configs, mesh=mesh)
    pp, _ = run_pp_trajectory(model, task_key, batches)
    np.testing.assert_allclose(pp, single, rtol=2e-4)


def test_pp_eval_forward_matches(rng):
    """The deterministic eval forward goes through the same pipeline path."""
    from climb_tpu.train.train_step import make_eval_step

    task_key = "snli-ve"
    batches = synthetic_batches(task_key, n_batches=1)
    base = make_model(task_key)
    eval_single = make_eval_step(base.module, task_key, LOSS_TYPES[task_key])
    logits_single, *_ = eval_single(base.params, batches[0])

    model = make_pp_model(task_key, pp_stages=2)
    eval_pp = make_eval_step(model.module, task_key, LOSS_TYPES[task_key])
    logits_pp, *_ = eval_pp(model.params, shard_batch(batches[0], model.mesh))
    np.testing.assert_allclose(
        np.asarray(logits_pp), np.asarray(logits_single), rtol=2e-4, atol=2e-5
    )


def test_pp_param_layout_is_canonical():
    """PP must not change the parameter tree: same structure and same values
    as the unpipelined model (checkpoints/freeze masks/HF grafting are
    pipeline-agnostic)."""
    base = make_model("snli-ve")
    pp = make_pp_model("snli-ve", pp_stages=2)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(base.params), jax.device_get(pp.params),
    )


def test_pp_rejects_tp_and_fsdp():
    args = SimpleNamespace(
        batch_size=8, seed=0, ordered_cl_tasks=["snli-ve"],
        encoder_name="vilt", pretrained_model_name="scratch", tiny=True,
        synthetic=True, image_height=CANVAS[0], image_width=CANVAS[1],
        pp_stages=2, fsdp=True,
    )
    with pytest.raises(ValueError, match="data parallelism only"):
        create_cl_model(args, task_configs)


def test_pp_config_requires_pipe_mesh():
    from climb_tpu.parallel.mesh import make_mesh

    cfg = vilt_config_from_args(
        SimpleNamespace(tiny=True, image_height=64, image_width=96), False
    ).replace(pp_stages=2, pp_mesh=make_mesh())  # no 'pipe' axis
    from climb_tpu.models.vilt_core import ViltCore

    core = ViltCore(cfg)
    b = 4
    batch = dict(
        input_ids=jnp.ones((b, cfg.max_text_len), jnp.int32),
        text_mask=jnp.ones((b, cfg.max_text_len), jnp.float32),
        pixel_values=jnp.zeros((b, 64, 96, 3), jnp.float32),
        patch_hw=jnp.ones((b, 2), jnp.int32),
    )
    params = core.init(jax.random.PRNGKey(0), **batch)["params"]
    with pytest.raises(ValueError, match="pipe"):
        core.apply({"params": params}, **batch)


def test_pp_rejects_mesh_without_pipe_axis():
    """--use_mesh's ('data','model') mesh reaching the factory with
    --pp_stages must fail actionably, not deep inside device_put."""
    from climb_tpu.parallel.mesh import make_mesh

    args = SimpleNamespace(
        batch_size=8, seed=0, ordered_cl_tasks=["snli-ve"],
        encoder_name="vilt", pretrained_model_name="scratch", tiny=True,
        synthetic=True, image_height=CANVAS[0], image_width=CANVAS[1],
        pp_stages=2,
    )
    with pytest.raises(ValueError, match="pipe"):
        create_cl_model(args, task_configs, mesh=make_mesh(n_model=2))
    with pytest.raises(ValueError, match="pp_stages=4"):
        create_cl_model(
            args.__class__(**{**vars(args), "pp_stages": 4}), task_configs,
            mesh=make_dp_pp_mesh(2),
        )
