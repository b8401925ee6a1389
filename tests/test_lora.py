"""LoRA per-task adapters (beyond reference — see docs/PARITY.md): low-rank
deltas on the attention q/v kernels with the same per-task activation and
isolation semantics as the bottleneck adapters."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.cl import AdapterHandler
from climb_tpu.configs import task_configs
from climb_tpu.train import TrainState, create_cl_model, make_train_step
from climb_tpu.train.optimizer import make_optimizer


def _args(**kw):
    base = dict(
        batch_size=4, seed=0, ordered_cl_tasks=["snli-ve", "nlvr2"],
        encoder_name="vilt", pretrained_model_name="scratch", tiny=True,
        synthetic=True, image_height=64, image_width=96,
        adapter_config="lora", adapter_reduction_factor=0,
        lora_rank=4, lora_alpha=8.0, lora_targets="",
    )
    base.update(kw)
    return SimpleNamespace(**base)


def _batch(rng, n=4):
    return {
        "input_ids": jnp.asarray(rng.randint(1, 100, (n, 40)), jnp.int32),
        "text_mask": jnp.ones((n, 40)),
        "pixel_values": jnp.asarray(rng.randint(0, 255, (n, 64, 96, 3)), jnp.uint8),
        "patch_hw": jnp.ones((n, 2), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 3, (n,)), jnp.int32),
    }


def _leaf_paths(tree):
    return {
        jax.tree_util.keystr(path): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree)
    }


@pytest.mark.smoke
def test_lora_init_is_identity(rng):
    """B=0 at init: activating an untrained LoRA leaves logits bit-unchanged
    vs a no-adapter model with the same base parameters."""
    args = _args()
    handler = AdapterHandler("vanilla", args)
    model = create_cl_model(args, task_configs, adapter_handler=handler)
    model_on = handler.activate_adapter_for_eval("snli-ve", model)

    plain = create_cl_model(
        _args(adapter_config=None), task_configs, adapter_handler=None
    )
    # graft the LoRA model's base params into the plain model (same seed init
    # would also match, but grafting removes any init-order dependence)
    plain_params = _leaf_paths(plain.params)
    lora_params = {
        k: v for k, v in _leaf_paths(model.params).items() if "adapter_lora" not in k
    }
    assert set(plain_params) == set(lora_params)

    batch = _batch(rng)
    logits_on = model_on.module.apply(
        {"params": model_on.params}, "snli-ve", batch_inputs(batch)
    )
    # same params minus LoRA leaves -> rebuild plain tree with model's values
    import flax.traverse_util as tu

    flat = tu.flatten_dict(model.params, sep="/")
    plain_tree = tu.unflatten_dict(
        {k: v for k, v in flat.items() if "adapter_lora" not in k}, sep="/"
    )
    logits_off = plain.module.apply(
        {"params": plain_tree}, "snli-ve", batch_inputs(batch)
    )
    np.testing.assert_array_equal(np.asarray(logits_on), np.asarray(logits_off))


def batch_inputs(batch):
    return {k: v for k, v in batch.items() if k != "labels"}


@pytest.mark.smoke
def test_lora_training_isolation(rng):
    """Training with task A's LoRA active updates only A's (A,B) pairs and
    A's head — mirrors the bottleneck-adapter isolation guarantee."""
    args = _args()
    handler = AdapterHandler("vanilla", args)
    model = create_cl_model(args, task_configs, adapter_handler=handler)
    model = handler.activate_adapter_for_training("snli-ve", model)

    tx = make_optimizer(model.params, lr=1e-2, total_steps=10, warmup_ratio=0.0,
                        trainable_mask=model.trainable_mask)
    state = TrainState.create(apply_fn=model.module.apply, params=model.params, tx=tx)
    step = make_train_step(model.module, "snli-ve", "ce")
    before = _leaf_paths(model.params)
    state, _ = step(state, _batch(rng), jax.random.PRNGKey(0))
    after = _leaf_paths(state.params)

    changed = {k for k in before if not np.array_equal(before[k], after[k])}
    assert changed, "nothing trained"
    for k in changed:
        assert ("adapter_lora" in k and "snli_ve" in k) or "head_snli_ve" in k, (
            f"unexpected parameter changed: {k}"
        )
    assert any("adapter_lora" in k and "lora_a" in k for k in changed)
    assert any("adapter_lora" in k and "lora_b" in k for k in changed)
    assert not any("nlvr2" in k for k in changed)
    # default targets: q and v only, never k
    assert any("adapter_lora_q_" in k for k in changed)
    assert any("adapter_lora_v_" in k for k in changed)
    assert not any("adapter_lora_k_" in k for k in before)


def test_lora_custom_targets(rng):
    """lora_targets flag controls which projections get deltas."""
    args = _args(lora_targets="q,attn_out,fc2")
    handler = AdapterHandler("vanilla", args)
    model = create_cl_model(args, task_configs, adapter_handler=handler)
    keys = set(_leaf_paths(model.params))
    assert any("adapter_lora_q_" in k for k in keys)
    assert any("adapter_lora_attn_out_" in k for k in keys)
    assert any("adapter_lora_fc2_" in k for k in keys)
    assert not any("adapter_lora_v_" in k for k in keys)
    assert not any("adapter_lora_fc1_" in k for k in keys)


def test_lora_task_switch_changes_logits(rng):
    """After training task A, activating A vs B gives different logits (A's
    delta is live only when active)."""
    args = _args()
    handler = AdapterHandler("vanilla", args)
    model = create_cl_model(args, task_configs, adapter_handler=handler)
    trainable = handler.activate_adapter_for_training("snli-ve", model)

    tx = make_optimizer(trainable.params, lr=5e-2, total_steps=10, warmup_ratio=0.0,
                        trainable_mask=trainable.trainable_mask)
    state = TrainState.create(
        apply_fn=trainable.module.apply, params=trainable.params, tx=tx
    )
    step = make_train_step(trainable.module, "snli-ve", "ce")
    for i in range(2):
        state, _ = step(state, _batch(rng), jax.random.PRNGKey(i))

    batch = _batch(rng)
    on = handler.activate_adapter_for_eval("snli-ve", model)
    off = handler.activate_adapter_for_eval("nlvr2", model)
    la = on.module.apply({"params": state.params}, "snli-ve", batch_inputs(batch))
    lb = off.module.apply({"params": state.params}, "snli-ve", batch_inputs(batch))
    assert not np.allclose(np.asarray(la), np.asarray(lb))
