"""Optimizer/schedule parity: poly-warmup schedule vs HF reference values,
weight-decay mask coverage, update masking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from climb_tpu.train.optimizer import (
    apply_update_mask,
    make_optimizer,
    polynomial_warmup_schedule,
    weight_decay_mask,
)


def test_schedule_matches_hf_polynomial_decay():
    """Compare against transformers.get_polynomial_decay_schedule_with_warmup
    (the reference's scheduler, train_snli_ve.py:183-189)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    lr, total, warmup = 1e-4, 100, 10
    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([param], lr=lr)
    sched = transformers.get_polynomial_decay_schedule_with_warmup(
        opt, num_warmup_steps=warmup, num_training_steps=total, lr_end=0, power=1
    )
    mine = polynomial_warmup_schedule(lr, total, warmup_ratio=warmup / total)
    for step in range(0, total + 1, 7):
        ref = sched.lr_lambdas[0](step) * lr
        np.testing.assert_allclose(float(mine(step)), ref, rtol=1e-6, atol=1e-12)


def test_weight_decay_mask():
    """Reference no_decay = ['bias', 'LayerNorm.weight'] substring grouping
    (vilt.py:209-213): only the text-embeddings LN weight escapes decay —
    encoder/head LN weights (lowercase/positional torch names) are decayed."""
    params = {
        "dense": {"kernel": np.zeros((2, 2)), "bias": np.zeros((2,))},
        "ln": {"scale": np.zeros((2,)), "bias": np.zeros((2,))},
        "text_layernorm": {"scale": np.zeros((2,)), "bias": np.zeros((2,))},
        "word_embeddings": np.zeros((4, 2)),
        "bert": {"emb_ln": {"scale": np.zeros((2,))}},
    }
    m = weight_decay_mask(params)
    assert m["dense"]["kernel"] is True
    assert m["dense"]["bias"] is False
    assert m["ln"]["scale"] is True  # decayed! ('layernorm_before.weight' etc.
    #                                  miss the 'LayerNorm.weight' substring)
    assert m["text_layernorm"]["scale"] is False  # the one HF-capital LN
    assert m["bert"]["emb_ln"]["scale"] is False  # HF BERT LNs are capital
    assert m["word_embeddings"] is True  # embeddings decay (reference grouping)


def test_update_mask_blocks_weight_decay_drift():
    """Frozen params must not move even with weight decay and zero grads."""
    params = {"a": jnp.ones((2,)), "b": jnp.ones((2,))}
    mask = {"a": jnp.asarray(1.0), "b": jnp.asarray(0.0)}
    tx = make_optimizer(params, lr=0.1, total_steps=10, warmup_ratio=0.0,
                        weight_decay=0.5, trainable_mask=mask)
    opt_state = tx.init(params)
    grads = {"a": jnp.ones((2,)), "b": jnp.zeros((2,))}
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    assert not np.allclose(np.asarray(new["a"]), 1.0)       # trained
    np.testing.assert_array_equal(np.asarray(new["b"]), 1.0)  # fully frozen


def test_per_layer_vector_mask():
    """Stacked-leaf masks freeze slices of one leaf (freeze_bottom_k path)."""
    params = {"enc": jnp.ones((3, 2))}
    mask = {"enc": jnp.asarray([[0.0], [0.0], [1.0]])}
    tx = make_optimizer(params, lr=0.1, total_steps=10, warmup_ratio=0.0,
                        trainable_mask=mask)
    opt_state = tx.init(params)
    updates, _ = tx.update({"enc": jnp.ones((3, 2))}, opt_state, params)
    new = np.asarray(optax.apply_updates(params, updates)["enc"])
    np.testing.assert_array_equal(new[:2], 1.0)
    assert (new[2] != 1.0).all()


def test_skip_nonfinite_guard():
    """--skip_nonfinite_updates: NaN/inf gradients skip the step (params +
    moments untouched, counter advances); finite trajectories are identical
    with the guard on or off; persistent failures apply through after the
    consecutive limit so they surface."""
    from climb_tpu.train.optimizer import nonfinite_skips

    params = {"w": jnp.ones((4,)), "bias": jnp.zeros((2,))}
    kw = dict(lr=1e-2, total_steps=10, warmup_ratio=0.0)
    guarded = make_optimizer(params, skip_nonfinite=2, **kw)
    plain = make_optimizer(params, **kw)

    finite = {"w": jnp.full((4,), 0.5), "bias": jnp.full((2,), -0.25)}
    bad = {"w": jnp.asarray([1.0, jnp.nan, 1.0, 1.0]), "bias": jnp.zeros((2,))}

    gs, ps = guarded.init(params), plain.init(params)
    assert nonfinite_skips(gs) == 0

    # a NaN step is skipped: zero updates, counter = 1
    up, gs = guarded.update(bad, gs, params)
    assert nonfinite_skips(gs) == 1
    assert all(np.all(np.asarray(u) == 0) for u in jax.tree_util.tree_leaves(up))

    # a finite step then matches the unguarded optimizer (1 ULP: the
    # guard's lax.cond path compiles with a different fusion order)
    up_g, gs = guarded.update(finite, gs, params)
    up_p, ps = plain.update(finite, ps, params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-9
        ),
        up_g, up_p,
    )
    assert nonfinite_skips(gs) == 1  # finite step resets the consecutive run

    # beyond max_consecutive_errors the update applies anyway (NaN surfaces)
    up, gs = guarded.update(bad, gs, params)
    up, gs = guarded.update(bad, gs, params)
    up, gs = guarded.update(bad, gs, params)
    assert not np.isfinite(np.asarray(up["w"])).all()


def test_skip_nonfinite_train_step_integration(tmp_path):
    """The wrapped opt state survives the real jitted train step and the
    elastic state serialization roundtrip."""
    from types import SimpleNamespace

    from flax import serialization

    from climb_tpu.configs import task_configs
    from climb_tpu.train import TrainState, create_cl_model, make_train_step

    args = SimpleNamespace(
        batch_size=4, seed=0, ordered_cl_tasks=["snli-ve"], encoder_name="vilt",
        pretrained_model_name="scratch", tiny=True, synthetic=True,
        image_height=64, image_width=96, skip_nonfinite_updates=3,
    )
    model = create_cl_model(args, task_configs)
    tx = make_optimizer(model.params, lr=1e-3, total_steps=10,
                        warmup_ratio=0.0, skip_nonfinite=3)
    state = TrainState.create(apply_fn=model.module.apply,
                              params=model.params, tx=tx)
    r = np.random.RandomState(0)
    batch = {
        "input_ids": jnp.asarray(r.randint(1, 100, (4, 40)), jnp.int32),
        "text_mask": jnp.ones((4, 40)),
        "pixel_values": jnp.asarray(r.randint(0, 255, (4, 64, 96, 3)), jnp.uint8),
        "patch_hw": jnp.ones((4, 2), jnp.int32),
        "labels": jnp.asarray(r.randint(0, 3, (4,)), jnp.int32),
    }
    step = make_train_step(model.module, "snli-ve", "ce")
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    sd = serialization.to_state_dict(state)
    restored = serialization.from_state_dict(state, sd)
    from climb_tpu.train.optimizer import nonfinite_skips

    assert nonfinite_skips(restored.opt_state) == 0


def test_bf16_first_moment():
    """--adam_moments_dtype bfloat16: mu stored in bf16, nu stays f32;
    updates track the f32 optimizer closely (accumulation is f32)."""
    params = {"w": jnp.ones((64,))}
    kw = dict(lr=1e-2, total_steps=10, warmup_ratio=0.0)
    tx16 = make_optimizer(params, moments_dtype="bfloat16", **kw)
    tx32 = make_optimizer(params, **kw)
    s16, s32 = tx16.init(params), tx32.init(params)
    mu16 = jax.tree_util.tree_leaves(
        [l for l in jax.tree_util.tree_leaves(s16) if hasattr(l, "dtype")]
    )
    assert any(l.dtype == jnp.bfloat16 for l in mu16)   # mu
    assert any(l.dtype == jnp.float32 for l in mu16)    # nu

    g = {"w": jnp.full((64,), 0.37)}
    u16, s16 = tx16.update(g, s16, params)
    u32, s32 = tx32.update(g, s32, params)
    np.testing.assert_allclose(np.asarray(u16["w"]), np.asarray(u32["w"]),
                               rtol=5e-3)
