"""Multi-step training-trajectory equivalence: DP x TP mesh vs single device.

The sharded train step must reproduce the unsharded loss trajectory over
multiple steps (same rngs, same batches) — validating that GSPMD's gradient
psum and TP collectives preserve the math, not just one step's loss.

Coverage is deliberately broad (every task loss incl. the NLVR2 image-pair
and VCR multi-choice batch folds, ViLT-BERT's nested {bert, vilt} tree, an
active adapter tree, LoRA, and the EWC-penalized step), with realistic MIXED
``patch_hw`` so the per-sample pos-embed interpolation and patch masking are
non-trivial under sharding.
"""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.configs import task_configs
from climb_tpu.data.collation import stack_collate
from climb_tpu.data.synthetic import make_synthetic_vl_dataset
from climb_tpu.parallel.mesh import make_mesh
from climb_tpu.parallel.sharding import shard_batch, shard_params
from climb_tpu.train import TrainState, create_cl_model, make_train_step
from climb_tpu.train.optimizer import make_optimizer
from climb_tpu.train.trainers import LOSS_TYPES

CANVAS = (64, 96)


def synthetic_batches(task_key, n_batches=3, bs=8, text_len=24, seed=7):
    """Real-pipeline batches (mixed patch_hw + ragged text masks) per task."""
    ds = make_synthetic_vl_dataset(
        task_key, task_configs[task_key], "train", bs * n_batches, text_len,
        CANVAS, seed,
    )
    out = []
    for j in range(n_batches):
        b = stack_collate([ds[j * bs + i] for i in range(bs)])
        out.append({k: jnp.asarray(v) for k, v in b.items()})
    return out


def make_model(task_key, encoder_name="vilt", adapter=None):
    args = SimpleNamespace(
        batch_size=8, seed=0, ordered_cl_tasks=[task_key],
        encoder_name=encoder_name, pretrained_model_name="scratch", tiny=True,
        synthetic=True, image_height=CANVAS[0], image_width=CANVAS[1],
    )
    handler = None
    if adapter is not None:
        from climb_tpu.cl.adapters import AdapterHandler

        args.adapter_config = adapter
        args.adapter_reduction_factor = 2
        args.lora_rank = 2 if adapter == "lora" else 0
        args.lora_alpha = 4.0 if adapter == "lora" else 0.0
        args.lora_targets = ""
        handler = AdapterHandler("vanilla", args)
    model = create_cl_model(args, task_configs, adapter_handler=handler)
    if handler is not None:
        model = handler.activate_adapter_for_training(task_key, model)
    return model


def make_ewc_ref(model):
    """Deterministic pseudo-EWC reference over the encoder subtree, built the
    way cl/ewc.py builds refs (host jnp.asarray leaves, no mesh placement) —
    pins that an UNSHARDED EwcRef composes with sharded params under jit."""
    from climb_tpu.train.train_step import EwcRef

    enc = model.params[model.encoder_key]
    fisher = jax.tree_util.tree_map(
        lambda p: jnp.asarray(np.abs(np.sin(np.arange(p.size)))
                              .reshape(p.shape).astype(np.float32)), enc
    )
    anchor = jax.tree_util.tree_map(lambda p: jnp.asarray(p) + 0.01, enc)
    return EwcRef(fisher=fisher, anchor=anchor,
                  weight=jnp.asarray(10.0, jnp.float32))


def run_trajectory(model, task_key, batches, mesh, fsdp=False, ewc_ref=None,
                   n_steps_total=10):
    params = jax.tree_util.tree_map(jnp.array, jax.device_get(model.params))
    bs = batches
    if mesh is not None:
        params = shard_params(params, mesh, fsdp=fsdp)
        bs = [shard_batch(b, mesh) for b in batches]
    tx = make_optimizer(params, lr=1e-3, total_steps=n_steps_total,
                        warmup_ratio=0.0, trainable_mask=model.trainable_mask)
    state = TrainState.create(apply_fn=model.module.apply, params=params, tx=tx)
    step = make_train_step(model.module, task_key, LOSS_TYPES[task_key])
    losses = []
    key = jax.random.PRNGKey(0)
    for b in bs:
        key, sub = jax.random.split(key)
        state, m = step(state, b, sub, ewc_ref)
        losses.append(float(m["loss"]))
        if ewc_ref is not None:
            assert np.isfinite(float(m["ewc_loss"]))
    return losses, state


CASES = [
    # (id, task_key, encoder, adapter, with_ewc)
    ("vqa_bce", "vqa", "vilt", None, False),
    ("nlvr2_pair_fold", "nlvr2", "vilt", None, False),
    ("vcr_mc_fold", "vcr", "vilt", None, False),
    ("viltbert", "snli-ve", "viltbert", None, False),
    ("adapter_houlsby", "snli-ve", "vilt", "houlsby", False),
    ("lora", "snli-ve", "vilt", "lora", False),
    ("ewc_penalized", "snli-ve", "vilt", None, True),
]


@pytest.mark.parametrize(
    "case_id,task_key,encoder,adapter,with_ewc",
    CASES, ids=[c[0] for c in CASES],
)
def test_sharded_trajectory_matches(case_id, task_key, encoder, adapter, with_ewc):
    model = make_model(task_key, encoder, adapter)
    batches = synthetic_batches(task_key)
    ewc_ref = make_ewc_ref(model) if with_ewc else None

    single, _ = run_trajectory(model, task_key, batches, None, ewc_ref=ewc_ref)
    assert all(np.isfinite(single)), single
    assert single[0] != single[-1], "trajectory is not training"

    dp_tp, _ = run_trajectory(
        model, task_key, batches, make_mesh(n_data=4, n_model=2),
        ewc_ref=ewc_ref,
    )
    np.testing.assert_allclose(dp_tp, single, rtol=2e-4)

    fsdp, _ = run_trajectory(
        model, task_key, batches, make_mesh(n_data=4, n_model=2), fsdp=True,
        ewc_ref=ewc_ref,
    )
    np.testing.assert_allclose(fsdp, single, rtol=2e-4)


def test_trajectory_matches(rng):
    """The original deep check on snli-ve: DP x TP, multi-slice DCN
    hierarchy, and FSDP opt-state sharding survival — now with realistic
    mixed patch_hw batches from the synthetic pipeline."""
    model = make_model("snli-ve")
    batches = synthetic_batches("snli-ve", n_batches=4)
    # the pipeline must actually be producing non-trivial validity geometry
    phw = np.asarray(batches[0]["patch_hw"])
    assert len(np.unique(phw, axis=0)) > 1, "patch_hw degenerate (all equal)"

    def run(mesh, fsdp=False):
        return run_trajectory(model, "snli-ve", batches, mesh, fsdp=fsdp)

    single, _ = run(None)
    sharded, _ = run(make_mesh(n_data=4, n_model=2))
    np.testing.assert_allclose(sharded, single, rtol=2e-4)
    # the trajectory must actually be training (loss moving)
    assert single[0] != single[-1]

    # multi-slice: 2 simulated DCN replicas x (2 data x 2 model) per slice —
    # hierarchical DP must reproduce the same trajectory too
    from climb_tpu.parallel.mesh import make_multislice_mesh

    multislice, _ = run(make_multislice_mesh(n_model=2, slice_count=2))
    np.testing.assert_allclose(multislice, single, rtol=2e-4)

    # FSDP (ZeRO-3): same math, parameters AND AdamW moments sharded over
    # 'data' — and the shardings must survive the jitted update step
    from climb_tpu.parallel.mesh import DATA_AXIS

    fsdp_losses, state = run(make_mesh(n_data=4, n_model=2), fsdp=True)
    np.testing.assert_allclose(fsdp_losses, single, rtol=2e-4)

    def data_sharded_leaves(tree):
        n = 0
        for leaf in jax.tree_util.tree_leaves(tree):
            spec = getattr(getattr(leaf, "sharding", None), "spec", ())
            if any(DATA_AXIS in (ax if isinstance(ax, tuple) else (ax,))
                   for ax in spec if ax is not None):
                n += 1
        return n

    assert data_sharded_leaves(state.params) > 0
    assert data_sharded_leaves(state.opt_state) > 0
