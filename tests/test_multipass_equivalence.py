"""Batch-folded multi-image / multi-choice forwards must equal the
reference's sequential per-image / per-choice encoder passes
(reference vilt.py:263-307 / :309-350 — loops we replaced with folds)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.models import HeadSpec, ViltConfig, ViltContinualLearner


@pytest.fixture(scope="module")
def setup():
    cfg = ViltConfig(
        vocab_size=120, hidden_size=64, num_layers=2, num_heads=4,
        intermediate_size=128, image_height=64, image_width=96, patch_size=32,
        pretrain_image_size=64, modality_type_vocab_size=3,
    )
    specs = (
        HeadSpec("nlvr2", "classification", 2, 2),
        HeadSpec("vcr", "multi-choice", 4, 1, 4),
    )
    model = ViltContinualLearner(cfg, specs)
    rng = np.random.RandomState(1)
    b, L = 3, 40
    batch = {
        "input_ids": jnp.asarray(rng.randint(1, 120, (b, L)), jnp.int32),
        "text_mask": jnp.ones((b, L), jnp.float32),
        "pixel_values": jnp.asarray(rng.rand(b, 64, 96, 3), jnp.float32),
        "patch_hw": jnp.asarray(rng.randint(1, 3, (b, 2)), jnp.int32),
    }
    params = model.init(jax.random.PRNGKey(0), batch,
                        method=ViltContinualLearner.init_all)
    return cfg, model, params, rng, b, L


def test_pair_fold_equals_sequential_passes(setup):
    cfg, model, params, rng, b, L = setup
    pv = jnp.asarray(rng.rand(b, 2, 64, 96, 3), jnp.float32)
    phw = jnp.asarray(rng.randint(1, 3, (b, 2, 2)), jnp.int32)
    ids = jnp.asarray(rng.randint(1, 120, (b, L)), jnp.int32)
    mask = jnp.ones((b, L), jnp.float32)
    batch = {"input_ids": ids, "text_mask": mask, "pixel_values": pv, "patch_hw": phw}
    folded = model.apply(params, "nlvr2", batch)

    # reference semantics: one full encoder pass per image with
    # image_token_type_idx = i+1, concat pooled -> head
    def encode(i):
        return model.apply(
            params,
            ids, mask, pv[:, i], phw[:, i],
            jnp.full((b,), i + 1, jnp.int32),
            method=lambda m, *a: m.encoder(*a),
        )[1]

    pooled = jnp.concatenate([encode(0), encode(1)], axis=-1)
    seq_logits = model.apply(
        params, pooled, method=lambda m, p: m.heads["nlvr2"](p)
    )
    np.testing.assert_allclose(np.asarray(folded), np.asarray(seq_logits),
                               atol=1e-5, rtol=1e-5)


def test_multichoice_fold_equals_sequential_passes(setup):
    cfg, model, params, rng, b, L = setup
    nc = 4
    ids = jnp.asarray(rng.randint(1, 120, (b, nc, L)), jnp.int32)
    mask = jnp.ones((b, nc, L), jnp.float32)
    pv = jnp.asarray(rng.rand(b, 64, 96, 3), jnp.float32)
    phw = jnp.asarray(rng.randint(1, 3, (b, 2)), jnp.int32)
    batch = {"input_ids": ids, "text_mask": mask, "pixel_values": pv, "patch_hw": phw}
    folded = model.apply(params, "vcr", batch)

    # reference: one encoder pass per choice with the shared image
    scores = []
    for c in range(nc):
        pooled = model.apply(
            params, ids[:, c], mask[:, c], pv, phw, None,
            method=lambda m, *a: m.encoder(*a),
        )[1]
        s = model.apply(params, pooled, method=lambda m, p: m.heads["vcr"](p))
        scores.append(s[:, 0])
    seq_logits = jnp.stack(scores, axis=1)
    np.testing.assert_allclose(np.asarray(folded), np.asarray(seq_logits),
                               atol=1e-5, rtol=1e-5)
