"""Text-length bucketing: shorter text arrays for shorter texts.

The sequence-axis analog of aspect bucketing (tests/test_aspect_buckets.py):
typical VQA/SNLI-VE texts are 10-15 tokens but every batch pays attention +
MLP FLOPs for the full 40-token pad. The loader groups examples by real
token count and slices each batch's text arrays to its bucket; the model
derives its position table slice from the traced length (vilt_core.py), so
each bucket is just another static-shape jit specialization. These tests pin
the safety claims:

1. slicing masked padding tokens never changes results;
2. the bucketed loader partitions the dataset deterministically with
   correctly-sliced, homogeneous batches — composing with aspect buckets;
3. mispredictions fall back to widening, never to cutting live tokens.
"""

from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.configs import task_configs
from climb_tpu.data.collation import stack_collate
from climb_tpu.data.loader import (
    DataLoader,
    crop_examples_to_text_len,
    parse_text_buckets,
)
from climb_tpu.data.synthetic import make_synthetic_vl_dataset
from climb_tpu.train import create_cl_model
from climb_tpu.train.optimizer import make_optimizer
from climb_tpu.train.train_state import TrainState
from climb_tpu.train.train_step import make_eval_step, make_train_step


def make_args(**kw):
    base = dict(
        batch_size=8,
        seed=42,
        synthetic=True,
        synthetic_train_size=48,
        tiny=True,
        num_workers=2,
        ordered_cl_tasks=["snli-ve"],
        encoder_name="vilt",
        pretrained_model_name="scratch",
        image_height=64,
        image_width=96,
    )
    base.update(kw)
    return SimpleNamespace(**base)


@pytest.fixture(scope="module")
def tiny_model():
    return create_cl_model(make_args(), task_configs)


def _batch(text_len, real_lens, rng, n=4, canvas_hw=(64, 96)):
    """Batch whose per-sample real token counts are `real_lens`, right-padded
    to `text_len`."""
    ids = np.zeros((n, text_len), np.int32)
    mask = np.zeros((n, text_len), np.float32)
    for i, ln in enumerate(real_lens):
        ids[i, :ln] = rng.randint(1, 1000, (ln,))
        mask[i, :ln] = 1.0
    h, w = canvas_hw
    return {
        "input_ids": jnp.asarray(ids),
        "text_mask": jnp.asarray(mask),
        "pixel_values": jnp.asarray(rng.randint(0, 255, (n, h, w, 3)), jnp.uint8),
        "patch_hw": jnp.broadcast_to(jnp.array([h // 32, w // 32], jnp.int32), (n, 2)),
        "labels": jnp.asarray(rng.randint(0, 3, (n,)), jnp.int32),
    }


@pytest.mark.smoke
def test_sliced_text_forward_equivalence(tiny_model):
    """Same real tokens padded to 40 vs sliced to 16 -> identical logits
    (padding tokens are masked out of attention; the model slices its
    position table by the traced length)."""
    model = tiny_model
    rng = np.random.RandomState(0)
    full = _batch(40, [5, 12, 16, 9], rng)
    sliced = dict(full)
    for k in ("input_ids", "text_mask"):
        sliced[k] = full[k][:, :16]
    step = make_eval_step(model.module, "snli-ve", "ce")
    logits_full, _, _ = step(model.params, full)
    logits_sliced, _, _ = step(model.params, sliced)
    np.testing.assert_allclose(
        np.asarray(logits_full), np.asarray(logits_sliced), rtol=0, atol=1e-5
    )


@pytest.mark.smoke
def test_text_bucketed_loader_partition_and_slice():
    ds = make_synthetic_vl_dataset(
        "snli-ve", task_configs["snli-ve"], "train", 50, canvas_hw=(64, 96)
    )
    buckets = (16, 24, 40)
    loader = DataLoader(ds, 8, stack_collate, shuffle=True, seed=7,
                        text_bucket_lens=buckets)
    lens = ds.text_lengths()
    seen = []
    n_batches = 0
    for (indices, _bw, tl), batch in zip(loader._index_batches(), loader):
        n_batches += 1
        seen.extend(indices.tolist())
        # homogeneity: every example's real token count fits the bucket
        assert max(lens[i] for i in indices) <= tl
        # the batch text arrays are sliced exactly to the bucket
        assert batch["input_ids"].shape[-1] == tl
        assert batch["text_mask"].shape[-1] == tl
        assert batch["token_type_ids"].shape[-1] == tl
        # no live token lost
        for row, i in enumerate(indices):
            assert int(batch["text_mask"][row].sum()) == lens[i]
    assert sorted(seen) == list(range(50))  # every example exactly once
    assert n_batches == len(loader)


def test_combined_aspect_and_text_buckets():
    """Cross-product bucketing: batches are homogeneous in BOTH canvas width
    and text length, and still a deterministic partition."""
    ds = make_synthetic_vl_dataset(
        "snli-ve", task_configs["snli-ve"], "train", 64, canvas_hw=(64, 96)
    )
    mk = lambda: DataLoader(
        ds, 4, stack_collate, shuffle=True, seed=3,
        bucket_widths=(32, 64, 96), text_bucket_lens=(16, 24, 40),
    )
    widths, lens = ds.canvas_widths(), ds.text_lengths()
    loader = mk()
    seen = []
    for (indices, bw, tl), batch in zip(loader._index_batches(), loader):
        seen.extend(indices.tolist())
        assert max(widths[i] for i in indices) <= bw
        assert max(lens[i] for i in indices) <= tl
        assert batch["pixel_values"].shape[-2] == bw
        assert batch["input_ids"].shape[-1] == tl
    assert sorted(seen) == list(range(64))
    a = [t[0].tolist() for t in mk()._index_batches()]
    b = [t[0].tolist() for t in mk()._index_batches()]
    assert a == b


def test_multi_choice_text_slicing():
    """VCR-style (C, L) text arrays slice on the last axis."""
    ds = make_synthetic_vl_dataset(
        "vcr", task_configs["vcr"], "train", 24, canvas_hw=(64, 96)
    )
    loader = DataLoader(ds, 4, stack_collate, shuffle=True,
                        text_bucket_lens=(16, 24, 40))
    lens = ds.text_lengths()
    for (indices, _bw, tl), batch in zip(loader._index_batches(), loader):
        assert batch["input_ids"].shape[1:] == (4, tl)
        for row, i in enumerate(indices):
            assert int(batch["text_mask"][row].sum(-1).max()) == lens[i]


def test_text_slice_safety_widens_on_surprise():
    """An example whose real text is longer than the bucket predicted widens
    (to a multiple of 8) instead of cutting live tokens."""
    ids = np.arange(1, 41, dtype=np.int32)
    mask = np.zeros((40,), np.float32)
    mask[:21] = 1.0  # 21 live tokens, bucket says 16
    ex = {"input_ids": ids, "text_mask": mask}
    out = crop_examples_to_text_len([ex], 16)
    assert out[0]["input_ids"].shape == (24,)  # 21 rounded up to 24
    assert int(out[0]["text_mask"].sum()) == 21


def test_text_bucketed_training_runs(tiny_model):
    """Mixed text lengths stream through one jitted train step (one
    specialization per bucket) and the optimizer advances."""
    model = tiny_model
    ds = make_synthetic_vl_dataset(
        "snli-ve", task_configs["snli-ve"], "train", 32, canvas_hw=(64, 96)
    )
    loader = DataLoader(ds, 8, stack_collate, shuffle=True,
                        text_bucket_lens=(16, 24, 40))
    tx = make_optimizer(model.params, lr=1e-3, total_steps=10, warmup_ratio=0)
    state = TrainState.create(apply_fn=model.module.apply, params=model.params, tx=tx)
    step = make_train_step(model.module, "snli-ve", "ce")
    rng = jax.random.PRNGKey(0)
    shapes = set()
    for batch in loader:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        shapes.add(batch["input_ids"].shape[-1])
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        assert np.isfinite(float(metrics["loss"]))
    assert len(shapes) > 1  # actually exercised multiple text lengths
    assert int(state.step) == len(loader)


def test_parse_text_buckets():
    assert parse_text_buckets(None) is None
    assert parse_text_buckets("auto", 40) == (16, 24, 40)
    assert parse_text_buckets("auto", 20) == (16, 20)
    assert parse_text_buckets("16,32", 40) == (16, 32, 40)  # max always kept
    assert parse_text_buckets((8, 60), 40) == (8, 40)  # capped at max


def test_predict_bucketed_predictions_align_with_dataset_order(tmp_path):
    """Bucketing permutes the eval batch stream; predict must invert the
    permutation so predictions[i] is example i (regression: bucketed
    predictions used to be in bucket-emission order)."""
    import json

    from climb_tpu.cli.predict import main as predict_main
    from climb_tpu.cli.train_upstream_continual_learning import main as upstream_main

    base = [
        "--encoder_name", "vilt",
        "--pretrained_model_name", "scratch",
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "24",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--ordered_cl_tasks", "snli-ve",
        "--cl_algorithm", "singletask_ft",
    ]
    upstream_main(base + ["--do_train"])
    ckpt = str(tmp_path / "vilt-singletask_ft-task0_snli-ve" / "checkpoints"
               / "task0_snli-ve" / "model")

    common = [
        "--encoder_name", "vilt",
        "--ordered_cl_tasks", "snli-ve",
        "--task_key", "snli-ve",
        "--checkpoint", ckpt,
        "--climb_data_dir", "/tmp/unused",
        "--synthetic", "--tiny", "--synthetic_train_size", "24",
        "--batch_size", "8",
        "--output_dir", str(tmp_path),
        "--pretrained_model_name", "scratch",
    ]
    plain_out = tmp_path / "plain.json"
    predict_main(common + ["--output_file", str(plain_out)])
    bucketed_out = tmp_path / "bucketed.json"
    predict_main(common + ["--text_buckets", "8,16,40",
                           "--output_file", str(bucketed_out)])

    plain = json.loads(plain_out.read_text())
    bucketed = json.loads(bucketed_out.read_text())
    assert bucketed["n_examples"] == plain["n_examples"]
    # same examples, same model, same compute dtype -> identical predictions
    # in the SAME (dataset) order
    assert bucketed["predictions"] == plain["predictions"]
    assert bucketed["metric"] == pytest.approx(plain["metric"], abs=1e-6)
