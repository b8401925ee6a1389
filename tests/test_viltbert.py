"""ViLT-BERT: BERT parity vs HF, frozen-text semantics, end-to-end training."""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.models.bert import BertConfig, BertCore
from climb_tpu.models.hf_import import import_hf_bert


def test_bert_parity_vs_hf(rng):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    torch.manual_seed(0)
    hf_cfg = transformers.BertConfig(
        vocab_size=100, hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, max_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    hf = transformers.BertModel(hf_cfg, add_pooling_layer=False).eval()
    cfg = BertConfig(vocab_size=100, hidden_size=64, num_layers=2, num_heads=4,
                     intermediate_size=128, max_position_embeddings=64)
    params = {"params": import_hf_bert(hf.state_dict(), 2)}
    ids = rng.randint(1, 100, (2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.float32)
    mask[1, 9:] = 0.0
    with torch.no_grad():
        ref = hf(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    out = BertCore(cfg).apply(params, jnp.asarray(ids), jnp.asarray(mask))
    # compare only unmasked positions (HF masked positions still get computed)
    np.testing.assert_allclose(np.asarray(out)[0], ref[0], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out)[1, :9], ref[1, :9], atol=2e-5, rtol=1e-4)


def _make_model():
    from climb_tpu.configs import task_configs
    from climb_tpu.train import create_cl_model

    args = SimpleNamespace(
        batch_size=4, seed=0, ordered_cl_tasks=["snli-ve"], encoder_name="viltbert",
        pretrained_model_name="scratch", tiny=True, synthetic=True,
        image_height=64, image_width=96,
    )
    return args, create_cl_model(args, task_configs)


def test_viltbert_frozen_bert(rng):
    """One train step must leave every BERT parameter untouched."""
    from climb_tpu.configs import task_configs
    from climb_tpu.train import TrainState, get_task_trainer_class, make_train_step
    from climb_tpu.train.optimizer import make_optimizer

    args, model = _make_model()
    assert model.encoder_key == "viltbert"
    assert "bert" in model.params["viltbert"]

    # warmup_ratio=0 so the very first step has a non-zero learning rate
    tx = make_optimizer(model.params, lr=1e-3, total_steps=10, warmup_ratio=0.0,
                        trainable_mask=model.trainable_mask)
    state = TrainState.create(apply_fn=model.module.apply, params=model.params, tx=tx)
    step = make_train_step(model.module, "snli-ve", "ce")
    cfg = model.cfg
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 100, (4, 40)), jnp.int32),
        "text_mask": jnp.ones((4, 40)),
        "pixel_values": jnp.asarray(rng.randint(0, 255, (4, 64, 96, 3)), jnp.uint8),
        "patch_hw": jnp.ones((4, 2), jnp.int32),
        "labels": jnp.asarray(rng.randint(0, 3, (4,)), jnp.int32),
    }
    bert_before = jax.device_get(model.params["viltbert"]["bert"])
    vilt_before = jax.device_get(model.params["viltbert"]["vilt"])
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0))
    bert_after = jax.device_get(new_state.params["viltbert"]["bert"])
    vilt_after = jax.device_get(new_state.params["viltbert"]["vilt"])

    for b, a in zip(jax.tree_util.tree_leaves(bert_before), jax.tree_util.tree_leaves(bert_after)):
        np.testing.assert_array_equal(b, a)
    # the ViLT side must actually move
    moved = any(
        not np.array_equal(b, a)
        for b, a in zip(jax.tree_util.tree_leaves(vilt_before), jax.tree_util.tree_leaves(vilt_after))
    )
    assert moved


def test_viltbert_trains(rng):
    from climb_tpu.configs import task_configs
    from climb_tpu.train import get_task_trainer_class

    args, model = _make_model()
    args.synthetic_train_size = 16
    args.num_workers = 2
    trainer_cls = get_task_trainer_class("snli-ve")
    trainer = trainer_cls(args, task_configs, model_config={})
    trainer.num_epochs = 1
    trainer.max_steps = len(trainer.train_dataloader)
    score, model = trainer.train(model)
    assert 0.0 <= score <= 100.0
