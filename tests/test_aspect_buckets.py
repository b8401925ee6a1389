"""Aspect bucketing: narrower canvases for narrower images.

The fixed canvas spends MXU FLOPs on padding patches whenever a batch's
images are narrower than it; measured on v5e the 384x512 canvas trains 1.21x
faster than 384x640 (exp_scripts/bench_canvas.py, docs/PERF.md). Bucketing
groups examples by resized width in the loader and crops each batch's canvas
to its bucket. These tests pin the two claims that make it safe:

1. cropping padding columns never changes results (attention masks them);
2. the bucketed loader is a deterministic permutation of the dataset with
   homogeneous, correctly-cropped batches (resume/skip semantics intact).
"""

from types import SimpleNamespace

import numpy as np
import pytest

import jax.numpy as jnp

from climb_tpu.configs import task_configs
from climb_tpu.data.collation import stack_collate
from climb_tpu.data.loader import DataLoader, crop_examples_to_bucket
from climb_tpu.data.synthetic import make_synthetic_vl_dataset
from climb_tpu.train import create_cl_model
from climb_tpu.train.train_step import make_eval_step, make_train_step
from climb_tpu.train.optimizer import make_optimizer
from climb_tpu.train.train_state import TrainState


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


def _batch(canvas_w, widths, rng, n=4, canvas_h=64, patch=32):
    """Batch whose per-sample valid widths are `widths` on a canvas_w canvas."""
    pv = np.zeros((n, canvas_h, canvas_w, 3), np.uint8)
    phw = np.zeros((n, 2), np.int32)
    for i, w in enumerate(widths):
        pv[i, :, :w] = rng.randint(0, 255, (canvas_h, w, 3))
        phw[i] = (canvas_h // patch, w // patch)
    return {
        "input_ids": jnp.asarray(rng.randint(1, 1000, (n, 40)), jnp.int32),
        "text_mask": jnp.ones((n, 40), jnp.float32),
        "pixel_values": jnp.asarray(pv),
        "patch_hw": jnp.asarray(phw),
        "labels": jnp.asarray(rng.randint(0, 3, (n,)), jnp.int32),
    }


@pytest.mark.smoke
def test_cropped_canvas_forward_equivalence(tiny_model, rng):
    """Same valid pixels on a 96-wide vs cropped 64-wide canvas -> identical
    logits (padding patches are masked out of attention)."""
    model = tiny_model
    widths = [64, 32, 64, 32]
    full = _batch(96, widths, np.random.RandomState(0))
    cropped = dict(full)
    cropped["pixel_values"] = full["pixel_values"][:, :, :64]
    step = make_eval_step(model.module, "snli-ve", "ce")
    logits_full, _, _ = step(model.params, full)
    logits_crop, _, _ = step(model.params, cropped)
    np.testing.assert_allclose(
        np.asarray(logits_full), np.asarray(logits_crop), rtol=0, atol=1e-5
    )


@pytest.mark.smoke
def test_bucketed_loader_partition_and_crop():
    ds = make_synthetic_vl_dataset(
        "snli-ve", task_configs["snli-ve"], "train", 50, canvas_hw=(64, 96)
    )
    buckets = (32, 64, 96)
    loader = DataLoader(ds, 8, stack_collate, shuffle=True, seed=7,
                        bucket_widths=buckets)
    widths = ds.canvas_widths()
    seen = []
    n_batches = 0
    for (indices, bw, _tl), batch in zip(loader._index_batches(), loader):
        n_batches += 1
        seen.extend(indices.tolist())
        # homogeneity: every example's needed width fits the bucket
        assert max(widths[i] for i in indices) <= bw
        # the batch canvas is cropped exactly to the bucket
        assert batch["pixel_values"].shape[-2] == bw
        assert batch["pixel_values"].shape[0] == 8  # padded to batch_size
        valid = int(batch["valid"].sum())
        assert valid == len(indices)
    assert sorted(seen) == list(range(50))  # every example exactly once
    assert n_batches == len(loader)


def test_bucketed_loader_deterministic_and_skippable():
    ds = make_synthetic_vl_dataset(
        "snli-ve", task_configs["snli-ve"], "train", 40, canvas_hw=(64, 96)
    )
    mk = lambda: DataLoader(ds, 8, stack_collate, shuffle=True, seed=3,
                            bucket_widths=(32, 64, 96))
    a, b = mk(), mk()
    a.set_epoch(2), b.set_epoch(2)
    ba = [t[0].tolist() for t in a._index_batches()]
    bb = [t[0].tolist() for t in b._index_batches()]
    assert ba == bb
    # skip replays the tail of the same deterministic stream
    full = [batch["input_ids"][:1].tolist() for batch in a]
    b.set_skip(2)
    tail = [batch["input_ids"][:1].tolist() for batch in b]
    assert tail == full[2:]


def test_crop_safety_widens_on_surprise():
    """An example needing more width than its bucket predicted (corrupt image
    -> full-size black canvas) widens the batch instead of losing pixels."""
    ex = {
        "pixel_values": np.ones((64, 96, 3), np.uint8),
        "patch_hw": np.array([2, 3], np.int32),  # needs all 96 columns
    }
    out = crop_examples_to_bucket([ex], 32)
    assert out[0]["pixel_values"].shape == (64, 96, 3)


def test_bucketed_training_runs(tiny_model):
    """Mixed-shape batches stream through one jitted train step (one
    specialization per bucket) and the optimizer advances."""
    model = tiny_model
    ds = make_synthetic_vl_dataset(
        "snli-ve", task_configs["snli-ve"], "train", 32, canvas_hw=(64, 96)
    )
    loader = DataLoader(ds, 8, stack_collate, shuffle=True,
                        bucket_widths=(32, 64, 96))
    tx = make_optimizer(model.params, lr=1e-3, total_steps=10, warmup_ratio=0)
    state = TrainState.create(apply_fn=model.module.apply, params=model.params, tx=tx)
    step = make_train_step(model.module, "snli-ve", "ce")
    import jax

    rng = jax.random.PRNGKey(0)
    shapes = set()
    for batch in loader:
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        shapes.add(batch["pixel_values"].shape[-2])
        rng, sub = jax.random.split(rng)
        state, metrics = step(state, batch, sub)
        assert np.isfinite(float(metrics["loss"]))
    assert len(shapes) > 1  # actually exercised multiple canvas widths
    assert int(state.step) == len(loader)


def test_parse_bucket_widths():
    from climb_tpu.data.loader import parse_bucket_widths

    assert parse_bucket_widths(None) is None
    assert parse_bucket_widths("auto", 640) == (320, 480, 640)
    assert parse_bucket_widths("auto", 96) == (32, 64, 96)
    assert parse_bucket_widths("384,512,640") == (384, 512, 640)
    assert parse_bucket_widths((512, 640)) == (512, 640)


def test_vision_dataset_canvas_widths(tmp_path):
    """Vision downstream datasets expose the bucketing hint too, and the
    prediction matches the loaded patch width."""
    from PIL import Image

    from climb_tpu.data.vision.datasets import ImageNetDataset

    root = tmp_path / "imagenet"
    for cls, size in (("n01", (100, 80)), ("n02", (60, 90))):  # (w, h)
        d = root / "train" / cls
        d.mkdir(parents=True)
        for j in range(2):
            Image.new("RGB", size, (10, 20, 30)).save(d / f"{cls}_{j}.JPEG")
    # with tiny per-class counts the val split absorbs every image
    ds = ImageNetDataset(str(root), "val", canvas_hw=(64, 96))
    widths = ds.canvas_widths()
    assert len(widths) == len(ds) == 4
    for i in range(len(ds)):
        actual = int(np.max(np.asarray(ds[i]["patch_hw"])[..., 1])) * 32
        assert widths[i] == actual
