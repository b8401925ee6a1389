"""Model-surgery pytree transforms (reference vilt.py:57-109 semantics):
token-type expansion and text/image sequence-budget reallocation."""

import jax
import jax.numpy as jnp
import numpy as np

from climb_tpu.models.model_config import ViltConfig
from climb_tpu.models.surgery import (
    expand_modality_type_embeddings,
    reallocate_text_image,
)
from climb_tpu.models.vilt_core import ViltCore

TINY = dict(
    vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, image_height=64, image_width=96,
    patch_size=32, pretrain_image_size=64,
)


def _init(cfg, rng, b=2):
    core = ViltCore(cfg)
    batch = dict(
        input_ids=jnp.asarray(rng.randint(1, 128, (b, cfg.max_text_len)), jnp.int32),
        text_mask=jnp.ones((b, cfg.max_text_len), jnp.float32),
        pixel_values=jnp.asarray(rng.randn(b, cfg.image_height, cfg.image_width, 3), jnp.float32),
        patch_hw=jnp.broadcast_to(jnp.array([cfg.grid_h, cfg.grid_w]), (b, 2)),
    )
    params = core.init(jax.random.PRNGKey(0), **batch)["params"]
    return core, params, batch


def test_expand_modality_copies_image_row(rng):
    cfg = ViltConfig(**TINY, modality_type_vocab_size=2)
    _, params, _ = _init(cfg, rng)
    new_params, new_cfg = expand_modality_type_embeddings(params, cfg)
    table = new_params["modality_type_embeddings"]
    assert new_cfg.modality_type_vocab_size == 3
    assert table.shape[0] == 3
    # new image-2 row := copy of image-1 row (reference vilt.py:106-108)
    np.testing.assert_array_equal(table[2], table[1])
    np.testing.assert_array_equal(table[:2], params["modality_type_embeddings"])
    # idempotent on an already-expanded tree
    again, cfg2 = expand_modality_type_embeddings(new_params, new_cfg)
    assert again["modality_type_embeddings"].shape[0] == 3


def test_expanded_token_type_2_equals_1_at_init(rng):
    """Immediately after expansion, image_token_type_idx=2 must produce the
    same outputs as idx=1 (rows identical) — the starting point NLVR2
    fine-tunes from."""
    cfg = ViltConfig(**TINY, modality_type_vocab_size=2)
    core, params, batch = _init(cfg, rng)
    new_params, new_cfg = expand_modality_type_embeddings(params, cfg)
    core3 = ViltCore(new_cfg)
    b = batch["input_ids"].shape[0]
    out1 = core3.apply({"params": new_params}, **batch,
                       image_token_type_idx=jnp.ones((b,), jnp.int32))
    out2 = core3.apply({"params": new_params}, **batch,
                       image_token_type_idx=jnp.full((b,), 2, jnp.int32))
    np.testing.assert_allclose(out1[1], out2[1], rtol=1e-6, atol=1e-6)


def test_reallocate_tiles_position_embeddings(rng):
    cfg = ViltConfig(**TINY)  # max_text_len 40
    _, params, _ = _init(cfg, rng)
    new_params, new_cfg = reallocate_text_image(params, cfg, max_text_len=100)
    # 100 -> next multiple of 40 = 120 (reference vilt.py:67)
    assert new_cfg.max_text_len == 120
    assert new_cfg.image_height == new_cfg.image_width == 128
    pos = new_params["text_position_embeddings"]
    old = params["text_position_embeddings"]
    assert pos.shape == (120, old.shape[1])
    for i in range(120):
        np.testing.assert_array_equal(pos[i], old[i % 40])


def test_reallocated_model_runs_long_text(rng):
    cfg = ViltConfig(**TINY)
    _, params, _ = _init(cfg, rng)
    new_params, new_cfg = reallocate_text_image(
        params, cfg, max_text_len=80, image_size=(64, 64)
    )
    core = ViltCore(new_cfg)
    b, l = 2, new_cfg.max_text_len
    seq, pooled, mask = core.apply(
        {"params": new_params},
        jnp.asarray(rng.randint(1, 128, (b, l)), jnp.int32),
        jnp.ones((b, l), jnp.float32),
        jnp.asarray(rng.randn(b, 64, 64, 3), jnp.float32),
        jnp.broadcast_to(jnp.array([new_cfg.grid_h, new_cfg.grid_w]), (b, 2)),
    )
    assert seq.shape == (b, l + 1 + new_cfg.num_patches, new_cfg.hidden_size)
    assert np.isfinite(np.asarray(pooled)).all()
