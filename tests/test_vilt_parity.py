"""Golden parity: climb_tpu ViltCore vs. HF ViltModel (random weights).

The reference's ground truth is the HF ``ViltModel`` it wraps
(``src/modeling/vilt.py:30-124``); pretrained weights are unavailable in this
hermetic environment, so parity is checked against a *random-initialized* HF
model on a small config — which exercises every converted tensor and every
numeric path (embeddings, per-sample pos-embed interpolation, masking, blocks,
pooler).

Note on comparison targets: HF's ``visual_embed`` compacts/permutes patch
tokens via ``torch.multinomial`` (modeling_vilt.py), so per-patch hidden
states are not order-aligned; the text-segment hidden states and the pooler
output are permutation-invariant and must match to float tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from climb_tpu.models import ViltConfig, ViltCore  # noqa: E402
from climb_tpu.models.hf_import import import_hf_vilt  # noqa: E402

HIDDEN = 64
LAYERS = 2
HEADS = 4
VOCAB = 100
H, W = 64, 96  # canvas: 2x3 patch grid


def small_cfg(**kw):
    return ViltConfig(
        vocab_size=VOCAB,
        hidden_size=HIDDEN,
        num_layers=LAYERS,
        num_heads=HEADS,
        intermediate_size=HIDDEN * 2,
        image_height=H,
        image_width=W,
        patch_size=32,
        pretrain_image_size=64,
        **kw,
    )


@pytest.fixture(scope="module")
def hf_model():
    torch.manual_seed(0)
    hf_cfg = transformers.ViltConfig(
        vocab_size=VOCAB,
        hidden_size=HIDDEN,
        num_hidden_layers=LAYERS,
        num_attention_heads=HEADS,
        intermediate_size=HIDDEN * 2,
        image_size=64,
        patch_size=32,
        max_position_embeddings=40,
        max_image_length=-1,
        modality_type_vocab_size=3,
    )
    model = transformers.ViltModel(hf_cfg)
    model.eval()
    # Random-init pos embeds are zeros in HF; give them signal so the
    # interpolation path is actually exercised.
    with torch.no_grad():
        model.embeddings.position_embeddings.normal_(0, 0.05)
        model.embeddings.cls_token.normal_(0, 0.05)
    return model


def make_inputs(rng, batch=2, text_len=12, img_hw=None):
    ids = rng.randint(1, VOCAB, size=(batch, text_len)).astype(np.int32)
    mask = np.ones((batch, text_len), np.float32)
    mask[1, text_len - 3 :] = 0.0  # ragged text
    pixels = rng.rand(batch, H, W, 3).astype(np.float32)
    if img_hw is None:
        img_hw = [(H, W)] * batch
    pixel_mask = np.zeros((batch, H, W), np.int64)
    for b, (h, w) in enumerate(img_hw):
        pixel_mask[b, :h, :w] = 1
        pixels[b, h:, :, :] = 0.0
        pixels[b, :, w:, :] = 0.0
    patch_hw = np.array([[int(np.ceil(h / 32)), int(np.ceil(w / 32))] for h, w in img_hw], np.int32)
    return ids, mask, pixels, pixel_mask, patch_hw


def run_hf(hf_model, ids, mask, pixels, pixel_mask, image_token_type_idx=None):
    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids, dtype=torch.long),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2),
            pixel_mask=torch.tensor(pixel_mask),
            image_token_type_idx=image_token_type_idx,
        )
    return out.last_hidden_state.numpy(), out.pooler_output.numpy()


def run_mine(hf_model, cfg, ids, mask, pixels, patch_hw, image_token_type_idx=None):
    core = ViltCore(cfg)
    params = {"params": import_hf_vilt(hf_model.state_dict(), cfg)}
    itti = None
    if image_token_type_idx is not None:
        itti = jnp.full((ids.shape[0],), image_token_type_idx, jnp.int32)
    seq, pooled, _ = core.apply(
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        jnp.asarray(pixels),
        jnp.asarray(patch_hw),
        image_token_type_idx=itti,
    )
    return np.asarray(seq), np.asarray(pooled)


def test_parity_full_canvas(hf_model, rng):
    """All images fill the canvas -> all patches valid."""
    cfg = small_cfg(modality_type_vocab_size=3)
    ids, mask, pixels, pixel_mask, patch_hw = make_inputs(rng)
    hf_seq, hf_pooled = run_hf(hf_model, ids, mask, pixels, pixel_mask)
    my_seq, my_pooled = run_mine(hf_model, cfg, ids, mask, pixels, patch_hw)
    L = ids.shape[1]
    np.testing.assert_allclose(my_seq[:, :L], hf_seq[:, :L], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(my_pooled, hf_pooled, atol=2e-5, rtol=1e-4)


def test_parity_variable_image_sizes(hf_model, rng):
    """Ragged images: exercises per-sample pos-embed interpolation + masking."""
    cfg = small_cfg(modality_type_vocab_size=3)
    ids, mask, pixels, pixel_mask, patch_hw = make_inputs(rng, img_hw=[(H, W), (32, 64)])
    hf_seq, hf_pooled = run_hf(hf_model, ids, mask, pixels, pixel_mask)
    my_seq, my_pooled = run_mine(hf_model, cfg, ids, mask, pixels, patch_hw)
    L = ids.shape[1]
    np.testing.assert_allclose(my_seq[:, :L], hf_seq[:, :L], atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(my_pooled, hf_pooled, atol=2e-5, rtol=1e-4)


def test_parity_image_token_type_2(hf_model, rng):
    """NLVR2's second image uses modality row 2 (vilt.py:292-303 semantics)."""
    cfg = small_cfg(modality_type_vocab_size=3)
    ids, mask, pixels, pixel_mask, patch_hw = make_inputs(rng)
    hf_seq, hf_pooled = run_hf(hf_model, ids, mask, pixels, pixel_mask, image_token_type_idx=2)
    my_seq, my_pooled = run_mine(hf_model, cfg, ids, mask, pixels, patch_hw, image_token_type_idx=2)
    np.testing.assert_allclose(my_pooled, hf_pooled, atol=2e-5, rtol=1e-4)


def test_text_embeds_input(hf_model, rng):
    """inputs_embeds path (ViLT-BERT feeds frozen BERT outputs here)."""
    cfg = small_cfg(modality_type_vocab_size=3)
    ids, mask, pixels, pixel_mask, patch_hw = make_inputs(rng)
    embeds = rng.randn(*ids.shape, HIDDEN).astype(np.float32) * 0.05
    with torch.no_grad():
        out = hf_model(
            inputs_embeds=torch.tensor(embeds),
            attention_mask=torch.tensor(mask),
            pixel_values=torch.tensor(pixels).permute(0, 3, 1, 2),
            pixel_mask=torch.tensor(pixel_mask),
        )
    core = ViltCore(cfg)
    params = {"params": import_hf_vilt(hf_model.state_dict(), cfg)}
    _, my_pooled, _ = core.apply(
        params,
        jnp.asarray(ids),
        jnp.asarray(mask),
        jnp.asarray(pixels),
        jnp.asarray(patch_hw),
        text_embeds=jnp.asarray(embeds),
    )
    np.testing.assert_allclose(np.asarray(my_pooled), out.pooler_output.numpy(), atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(
    not __import__("os").environ.get("CLIMB_TPU_PARITY_MODEL"),
    reason="set CLIMB_TPU_PARITY_MODEL=dandelin/vilt-b32-mlm (or a local HF "
           "ViltModel dir) to run golden parity against real weights — "
           "needs downloaded weights (docs/MIGRATION.md runbook)",
)
def test_parity_real_pretrained_weights(rng):
    """The runbook closer (docs/MIGRATION.md): the same tolerance asserts as
    the hermetic tests, against an actual pretrained (or any full-size,
    disk-saved) HF ViltModel at the production 384x640 canvas."""
    import os

    name = os.environ["CLIMB_TPU_PARITY_MODEL"]
    hf = transformers.ViltModel.from_pretrained(name)
    hf.eval()
    hc = hf.config
    ch, cw = 384, 640
    cfg = ViltConfig(
        vocab_size=hc.vocab_size,
        hidden_size=hc.hidden_size,
        num_layers=hc.num_hidden_layers,
        num_heads=hc.num_attention_heads,
        intermediate_size=hc.intermediate_size,
        image_height=ch,
        image_width=cw,
        patch_size=hc.patch_size,
        pretrain_image_size=hc.image_size,
        max_text_len=hc.max_position_embeddings,
        modality_type_vocab_size=hc.modality_type_vocab_size,
    )
    B, L = 2, 24
    ids = rng.randint(1, hc.vocab_size, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), np.float32)
    mask[1, L - 5:] = 0.0
    pixels = rng.rand(B, ch, cw, 3).astype(np.float32)
    img_hw = [(ch, cw), (256, 384)]  # one full canvas, one ragged image
    pixel_mask = np.zeros((B, ch, cw), np.int64)
    for b, (h, w) in enumerate(img_hw):
        pixel_mask[b, :h, :w] = 1
        pixels[b, h:, :, :] = 0.0
        pixels[b, :, w:, :] = 0.0
    patch_hw = np.array([[h // 32, w // 32] for h, w in img_hw], np.int32)

    hf_seq, hf_pooled = run_hf(hf, ids, mask, pixels, pixel_mask)
    my_seq, my_pooled = run_mine(hf, cfg, ids, mask, pixels, patch_hw)
    np.testing.assert_allclose(my_seq[:, :L], hf_seq[:, :L], atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(my_pooled, hf_pooled, atol=5e-4, rtol=1e-3)
