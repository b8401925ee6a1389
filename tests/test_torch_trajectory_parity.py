"""Optimization-trajectory parity vs the reference's exact torch step.

Reconstructs the reference's training step bit-for-bit in torch on a tiny
random HF ViltModel — AdamW betas (0.9, 0.98) with the
``no_decay = ['bias', 'LayerNorm.weight']`` substring grouping
(vilt.py:205-215), polynomial-decay warmup schedule (lr_end=0, power=1,
train_snli_ve.py:183-189), classification head Linear->LayerNorm->GELU->Linear
(vilt.py:190-195), CE loss, forward -> backward -> step -> sched.step
(train_snli_ve.py:118-157) — and asserts the climb-tpu jitted train step
reproduces the same loss trajectory in f32. This pins the full composition
(forward numerics + loss + grads + weight-decay grouping + schedule +
optimizer math) to the reference for everything except real weights/data.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from climb_tpu.models import HeadSpec, ViltConfig, ViltContinualLearner  # noqa: E402
from climb_tpu.models.hf_import import import_hf_vilt  # noqa: E402
from climb_tpu.train.optimizer import make_optimizer  # noqa: E402
from climb_tpu.train.train_state import TrainState  # noqa: E402
from climb_tpu.train.train_step import make_train_step  # noqa: E402

LR, WD, EPS = 1e-4, 1e-2, 1e-8
TOTAL_STEPS, WARMUP_RATIO = 30, 0.1
STEPS = 4
B, TEXT = 4, 12
VOCAB, HIDDEN, LAYERS, HEADS = 100, 64, 2, 4
H, W = 64, 96
NUM_LABELS = 3


def _reference_side(vilt, head, ids, mask, pixels, labels):
    full = torch.nn.ModuleDict({"vilt_encoder": vilt, "task_layer": head})
    full.train()
    # reference create_optimizer grouping, vilt.py:209-213
    no_decay = ["bias", "LayerNorm.weight"]
    grouped = [
        {"params": [p for n, p in full.named_parameters()
                    if not any(nd in n for nd in no_decay)], "weight_decay": WD},
        {"params": [p for n, p in full.named_parameters()
                    if any(nd in n for nd in no_decay)], "weight_decay": 0.0},
    ]
    opt = torch.optim.AdamW(grouped, lr=LR, eps=EPS, betas=(0.9, 0.98))
    sched = transformers.get_polynomial_decay_schedule_with_warmup(
        opt, int(TOTAL_STEPS * WARMUP_RATIO), TOTAL_STEPS, lr_end=0, power=1
    )
    t_ids = torch.tensor(ids, dtype=torch.long)
    t_mask = torch.tensor(mask)
    t_px = torch.tensor(pixels).permute(0, 3, 1, 2)
    t_pm = torch.ones(B, H, W, dtype=torch.long)
    t_y = torch.tensor(labels, dtype=torch.long)

    losses = []
    for _ in range(STEPS):
        out = vilt(input_ids=t_ids, attention_mask=t_mask,
                   pixel_values=t_px, pixel_mask=t_pm)
        logits = head(out.pooler_output)
        loss = torch.nn.functional.cross_entropy(logits, t_y)
        loss.backward()
        opt.step()
        sched.step()
        opt.zero_grad()
        losses.append(float(loss.detach()))
    return losses


def _head_to_flax(head):
    # np.array copies: .numpy() views torch's live memory, and jnp.asarray
    # on CPU can alias numpy buffers zero-copy — a later opt.step() would
    # then mutate these "converted" weights in place
    c = lambda t: np.array(t.detach().numpy())
    return {
        "fc1": {"kernel": c(head[0].weight).T, "bias": c(head[0].bias)},
        "ln": {"scale": c(head[1].weight), "bias": c(head[1].bias)},
        "fc2": {"kernel": c(head[3].weight).T, "bias": c(head[3].bias)},
    }


def test_loss_trajectory_matches_reference():
    torch.manual_seed(0)
    hf_cfg = transformers.ViltConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=HIDDEN * 2,
        image_size=64, patch_size=32, max_position_embeddings=40,
        max_image_length=-1,
    )
    vilt = transformers.ViltModel(hf_cfg)
    with torch.no_grad():
        vilt.embeddings.position_embeddings.normal_(0, 0.02)
        vilt.embeddings.cls_token.normal_(0, 0.02)
    head = torch.nn.Sequential(
        torch.nn.Linear(HIDDEN, HIDDEN * 2),
        torch.nn.LayerNorm(HIDDEN * 2),
        torch.nn.GELU(),
        torch.nn.Linear(HIDDEN * 2, NUM_LABELS),
    )

    rng = np.random.RandomState(0)
    ids = rng.randint(1, VOCAB, size=(B, TEXT)).astype(np.int32)
    mask = np.ones((B, TEXT), np.float32)
    pixels = rng.rand(B, H, W, 3).astype(np.float32)
    labels = rng.randint(0, NUM_LABELS, size=(B,)).astype(np.int32)

    cfg = ViltConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=LAYERS,
        num_heads=HEADS, intermediate_size=HIDDEN * 2,
        image_height=H, image_width=W, patch_size=32, pretrain_image_size=64,
    )
    # convert BEFORE the torch side trains, with real copies: the converted
    # tree holds numpy VIEWS of the live torch tensors, and opt.step()
    # mutates those in place
    vilt_params = jax.tree_util.tree_map(np.array, import_hf_vilt(vilt.state_dict(), cfg))
    head_params = _head_to_flax(head)

    ref_losses = _reference_side(vilt, head, ids, mask, pixels, labels)
    spec = HeadSpec(task_key="snli-ve", model_type="classification",
                    num_labels=NUM_LABELS, num_images=1, num_choices=None)
    module = ViltContinualLearner(cfg=cfg, head_specs=(spec,))
    batch = {
        "input_ids": jnp.asarray(ids),
        "text_mask": jnp.asarray(mask),
        "pixel_values": jnp.asarray(pixels),
        "patch_hw": jnp.asarray([[H // 32, W // 32]] * B, jnp.int32),
        "labels": jnp.asarray(labels),
    }
    params = dict(module.init(jax.random.PRNGKey(0), batch,
                              method=ViltContinualLearner.init_all)["params"])
    params["vilt"] = vilt_params
    params["head_snli_ve"] = head_params

    tx = make_optimizer(params, lr=LR, total_steps=TOTAL_STEPS,
                        warmup_ratio=WARMUP_RATIO, weight_decay=WD,
                        adam_epsilon=EPS)
    state = TrainState.create(apply_fn=module.apply, params=params, tx=tx)
    step = make_train_step(module, "snli-ve", "ce", jnp.float32)

    key = jax.random.PRNGKey(0)
    my_losses = []
    for _ in range(STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        my_losses.append(float(metrics["loss"]))

    # step 1's lr is 0 under warmup, so losses 1 and 2 are equal on both
    # sides; by step 4 the trajectories have taken 2 real AdamW updates.
    # Measured agreement is ~2e-7 relative; 1e-5 leaves platform headroom.
    np.testing.assert_allclose(my_losses, ref_losses, rtol=1e-5, atol=1e-6)
    assert abs(my_losses[-1] - my_losses[0]) > 1e-5  # actually trained


# ---------------------------------------------------------------------------
# The same pinning for the other upstream loss/forward compositions:
# VQA's soft-target BCE (train_vqa.py:95,157), NLVR2's two-pass image-pair
# forward (vilt.py:263-307) + CE, VCR's per-choice forward + mc_ce
# (vilt.py:309-350, with head dropout 0 on both sides — a cross-framework
# trajectory with live Dropout(0.1) is ill-defined; the fold==sequential
# equivalence is pinned separately in test_multipass_equivalence.py), and an
# EWC-penalized step (ewc.py:75-87).
# ---------------------------------------------------------------------------


def _tiny_hf_vilt(modality_type_vocab_size=2):
    torch.manual_seed(0)
    hf_cfg = transformers.ViltConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_hidden_layers=LAYERS,
        num_attention_heads=HEADS, intermediate_size=HIDDEN * 2,
        image_size=64, patch_size=32, max_position_embeddings=40,
        max_image_length=-1, modality_type_vocab_size=modality_type_vocab_size,
    )
    vilt = transformers.ViltModel(hf_cfg)
    with torch.no_grad():
        vilt.embeddings.position_embeddings.normal_(0, 0.02)
        vilt.embeddings.cls_token.normal_(0, 0.02)
    return vilt


def _torch_head(in_dim, num_labels):
    return torch.nn.Sequential(
        torch.nn.Linear(in_dim, HIDDEN * 2),
        torch.nn.LayerNorm(HIDDEN * 2),
        torch.nn.GELU(),
        torch.nn.Linear(HIDDEN * 2, num_labels),
    )


def _torch_optimizer(full):
    no_decay = ["bias", "LayerNorm.weight"]
    grouped = [
        {"params": [p for n, p in full.named_parameters()
                    if not any(nd in n for nd in no_decay)], "weight_decay": WD},
        {"params": [p for n, p in full.named_parameters()
                    if any(nd in n for nd in no_decay)], "weight_decay": 0.0},
    ]
    opt = torch.optim.AdamW(grouped, lr=LR, eps=EPS, betas=(0.9, 0.98))
    sched = transformers.get_polynomial_decay_schedule_with_warmup(
        opt, int(TOTAL_STEPS * WARMUP_RATIO), TOTAL_STEPS, lr_end=0, power=1
    )
    return opt, sched


def _my_trajectory(cfg, spec, loss_type, vilt_params, head_params, batch,
                   ewc_ref=None):
    """Loss trajectory of the production jitted step. With ewc_ref, also
    returns the post-update ewc_loss trajectory."""
    module = ViltContinualLearner(cfg=cfg, head_specs=(spec,))
    init_batch = dict(batch)
    if init_batch["pixel_values"].ndim == 5:  # init_all wants a single image
        init_batch["pixel_values"] = init_batch["pixel_values"][:, 0]
        init_batch["patch_hw"] = init_batch["patch_hw"][:, 0]
    if init_batch["input_ids"].ndim == 3:  # init_all wants unfolded text
        init_batch["input_ids"] = init_batch["input_ids"][:, 0]
        init_batch["text_mask"] = init_batch["text_mask"][:, 0]
    params = dict(module.init(jax.random.PRNGKey(0), init_batch,
                              method=ViltContinualLearner.init_all)["params"])
    params["vilt"] = vilt_params
    params[f"head_{spec.task_key.replace('-', '_')}"] = head_params
    tx = make_optimizer(params, lr=LR, total_steps=TOTAL_STEPS,
                        warmup_ratio=WARMUP_RATIO, weight_decay=WD,
                        adam_epsilon=EPS)
    state = TrainState.create(apply_fn=module.apply, params=params, tx=tx)
    step = make_train_step(module, spec.task_key, loss_type, jnp.float32)
    key = jax.random.PRNGKey(0)
    losses, ewc_losses = [], []
    for _ in range(STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub, ewc_ref)
        losses.append(float(metrics["loss"]))
        if ewc_ref is not None:
            ewc_losses.append(float(metrics["ewc_loss"]))
    if ewc_ref is not None:
        return losses, ewc_losses
    return losses


def test_vqa_bce_trajectory_matches_reference():
    """VQA: BCEWithLogits(reduction='mean') * num_labels over soft target
    scores (reference train_vqa.py:95,157) + the shared optimizer step."""
    num_answers = 7
    vilt = _tiny_hf_vilt()
    head = _torch_head(HIDDEN, num_answers)

    rng = np.random.RandomState(1)
    ids = rng.randint(1, VOCAB, size=(B, TEXT)).astype(np.int32)
    mask = np.ones((B, TEXT), np.float32)
    pixels = rng.rand(B, H, W, 3).astype(np.float32)
    # VQA soft scores live in {0, 0.3, 0.6, 0.9, 1.0} (utils/vqa_utils.py)
    scores = rng.choice([0.0, 0.3, 0.6, 0.9, 1.0], size=(B, num_answers)).astype(np.float32)

    cfg = ViltConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=LAYERS,
        num_heads=HEADS, intermediate_size=HIDDEN * 2,
        image_height=H, image_width=W, patch_size=32, pretrain_image_size=64,
    )
    vilt_params = jax.tree_util.tree_map(np.array, import_hf_vilt(vilt.state_dict(), cfg))
    head_params = _head_to_flax(head)

    full = torch.nn.ModuleDict({"vilt_encoder": vilt, "task_layer": head})
    full.train()
    opt, sched = _torch_optimizer(full)
    t_ids = torch.tensor(ids, dtype=torch.long)
    t_mask = torch.tensor(mask)
    t_px = torch.tensor(pixels).permute(0, 3, 1, 2)
    t_pm = torch.ones(B, H, W, dtype=torch.long)
    t_scores = torch.tensor(scores)
    crit = torch.nn.BCEWithLogitsLoss(reduction="mean")
    ref_losses = []
    for _ in range(STEPS):
        out = vilt(input_ids=t_ids, attention_mask=t_mask,
                   pixel_values=t_px, pixel_mask=t_pm)
        logits = head(out.pooler_output)
        loss = crit(logits, t_scores) * t_scores.shape[1]
        loss.backward()
        opt.step()
        sched.step()
        opt.zero_grad()
        ref_losses.append(float(loss.detach()))

    spec = HeadSpec(task_key="vqa", model_type="classification",
                    num_labels=num_answers, num_images=1, num_choices=None)
    batch = {
        "input_ids": jnp.asarray(ids),
        "text_mask": jnp.asarray(mask),
        "pixel_values": jnp.asarray(pixels),
        "patch_hw": jnp.asarray([[H // 32, W // 32]] * B, jnp.int32),
        "target_scores": jnp.asarray(scores),
    }
    my_losses = _my_trajectory(cfg, spec, "vqa_bce", vilt_params, head_params, batch)
    np.testing.assert_allclose(my_losses, ref_losses, rtol=1e-5, atol=1e-6)
    assert abs(my_losses[-1] - my_losses[0]) > 1e-5


def test_nlvr2_pair_trajectory_matches_reference():
    """NLVR2: one encoder pass per image with image_token_type_idx=i+1,
    concat pooled -> classification head -> CE (reference vilt.py:263-307,
    train_nlvr2.py), trained with the shared optimizer step. Pins the
    batch-folded pair forward's GRADIENTS (not just logits) to the
    reference's sequential two-pass formulation."""
    vilt = _tiny_hf_vilt(modality_type_vocab_size=3)
    head = _torch_head(HIDDEN * 2, 2)

    rng = np.random.RandomState(2)
    ids = rng.randint(1, VOCAB, size=(B, TEXT)).astype(np.int32)
    mask = np.ones((B, TEXT), np.float32)
    pixels = rng.rand(B, 2, H, W, 3).astype(np.float32)
    labels = rng.randint(0, 2, size=(B,)).astype(np.int32)

    cfg = ViltConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=LAYERS,
        num_heads=HEADS, intermediate_size=HIDDEN * 2,
        image_height=H, image_width=W, patch_size=32, pretrain_image_size=64,
        modality_type_vocab_size=3,
    )
    vilt_params = jax.tree_util.tree_map(np.array, import_hf_vilt(vilt.state_dict(), cfg))
    head_params = _head_to_flax(head)

    full = torch.nn.ModuleDict({"vilt_encoder": vilt, "task_layer": head})
    full.train()
    opt, sched = _torch_optimizer(full)
    t_ids = torch.tensor(ids, dtype=torch.long)
    t_mask = torch.tensor(mask)
    t_px = torch.tensor(pixels).permute(0, 1, 4, 2, 3)
    t_pm = torch.ones(B, H, W, dtype=torch.long)
    t_y = torch.tensor(labels, dtype=torch.long)
    ref_losses = []
    for _ in range(STEPS):
        pooled = [
            vilt(input_ids=t_ids, attention_mask=t_mask,
                 pixel_values=t_px[:, i], pixel_mask=t_pm,
                 image_token_type_idx=i + 1).pooler_output
            for i in range(2)
        ]
        logits = head(torch.cat(pooled, dim=-1))
        loss = torch.nn.functional.cross_entropy(logits, t_y)
        loss.backward()
        opt.step()
        sched.step()
        opt.zero_grad()
        ref_losses.append(float(loss.detach()))

    spec = HeadSpec(task_key="nlvr2", model_type="classification",
                    num_labels=2, num_images=2, num_choices=None)
    batch = {
        "input_ids": jnp.asarray(ids),
        "text_mask": jnp.asarray(mask),
        "pixel_values": jnp.asarray(pixels),
        "patch_hw": jnp.asarray(
            np.tile([[H // 32, W // 32]], (B, 2, 1)), jnp.int32
        ),
        "labels": jnp.asarray(labels),
    }
    my_losses = _my_trajectory(cfg, spec, "ce", vilt_params, head_params, batch)
    np.testing.assert_allclose(my_losses, ref_losses, rtol=1e-5, atol=1e-6)
    assert abs(my_losses[-1] - my_losses[0]) > 1e-5


def test_vcr_mc_trajectory_matches_reference():
    """VCR: one encoder pass per choice sharing pixel_values, stacked choice
    scores -> squeeze -> CE over 4 logits (reference vilt.py:309-350,
    train_vcr.py), trained with the shared optimizer step. Head dropout is 0
    on both sides (HeadSpec.dropout_rate) — with live Dropout the two
    frameworks would draw different masks and the comparison is ill-defined;
    everything else (per-choice fold forward, mc_ce loss, optimizer math,
    schedule) is pinned."""
    NC = 4
    vilt = _tiny_hf_vilt()
    torch.manual_seed(3)
    head = torch.nn.Sequential(torch.nn.Dropout(0.0), torch.nn.Linear(HIDDEN, 1))

    rng = np.random.RandomState(3)
    ids = rng.randint(1, VOCAB, size=(B, NC, TEXT)).astype(np.int32)
    mask = np.ones((B, NC, TEXT), np.float32)
    pixels = rng.rand(B, H, W, 3).astype(np.float32)
    labels = rng.randint(0, NC, size=(B,)).astype(np.int32)

    cfg = ViltConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=LAYERS,
        num_heads=HEADS, intermediate_size=HIDDEN * 2,
        image_height=H, image_width=W, patch_size=32, pretrain_image_size=64,
    )
    vilt_params = jax.tree_util.tree_map(np.array, import_hf_vilt(vilt.state_dict(), cfg))
    head_params = {"fc": {"kernel": np.array(head[1].weight.detach().numpy()).T,
                          "bias": np.array(head[1].bias.detach().numpy())}}

    full = torch.nn.ModuleDict({"vilt_encoder": vilt, "task_layer": head})
    full.train()
    opt, sched = _torch_optimizer(full)
    t_ids = torch.tensor(ids, dtype=torch.long)
    t_mask = torch.tensor(mask)
    t_px = torch.tensor(pixels).permute(0, 3, 1, 2)
    t_pm = torch.ones(B, H, W, dtype=torch.long)
    t_y = torch.tensor(labels, dtype=torch.long)
    ref_losses = []
    for _ in range(STEPS):
        scores = [
            head(vilt(input_ids=t_ids[:, c], attention_mask=t_mask[:, c],
                      pixel_values=t_px, pixel_mask=t_pm).pooler_output)
            for c in range(NC)
        ]
        logits = torch.stack(scores, dim=1).squeeze(-1)  # (B, NC)
        loss = torch.nn.functional.cross_entropy(logits, t_y)
        loss.backward()
        opt.step()
        sched.step()
        opt.zero_grad()
        ref_losses.append(float(loss.detach()))

    spec = HeadSpec(task_key="vcr", model_type="multi-choice", num_labels=NC,
                    num_images=1, num_choices=NC, dropout_rate=0.0)
    batch = {
        "input_ids": jnp.asarray(ids),
        "text_mask": jnp.asarray(mask),
        "pixel_values": jnp.asarray(pixels),
        "patch_hw": jnp.asarray([[H // 32, W // 32]] * B, jnp.int32),
        "labels": jnp.asarray(labels),
    }
    my_losses = _my_trajectory(cfg, spec, "mc_ce", vilt_params, head_params, batch)
    np.testing.assert_allclose(my_losses, ref_losses, rtol=1e-5, atol=1e-6)
    assert abs(my_losses[-1] - my_losses[0]) > 1e-5


def test_ewc_penalized_trajectory_matches_reference():
    """EWC-penalized step: loss += weight * sum_i F_i (theta_i - theta*_i)^2
    over the ENCODER params only (reference ewc.py:75-87), with the anchor =
    the initial encoder snapshot and a synthetic elementwise Fisher
    F = theta*^2 + 0.05 (any elementwise function of the anchor is layout-
    invariant, so the torch and flax trees see identical values). Pins the
    penalty's gradient effect + the separately-logged post-update ewc_loss."""
    from climb_tpu.train.train_step import EwcRef

    W_EWC = 100.0
    vilt = _tiny_hf_vilt()
    torch.manual_seed(4)
    head = _torch_head(HIDDEN, NUM_LABELS)

    rng = np.random.RandomState(4)
    ids = rng.randint(1, VOCAB, size=(B, TEXT)).astype(np.int32)
    mask = np.ones((B, TEXT), np.float32)
    pixels = rng.rand(B, H, W, 3).astype(np.float32)
    labels = rng.randint(0, NUM_LABELS, size=(B,)).astype(np.int32)

    cfg = ViltConfig(
        vocab_size=VOCAB, hidden_size=HIDDEN, num_layers=LAYERS,
        num_heads=HEADS, intermediate_size=HIDDEN * 2,
        image_height=H, image_width=W, patch_size=32, pretrain_image_size=64,
    )
    vilt_params = jax.tree_util.tree_map(np.array, import_hf_vilt(vilt.state_dict(), cfg))
    head_params = _head_to_flax(head)

    # anchor/Fisher on the torch side: initial encoder params
    t_anchor = {n: p.detach().clone() for n, p in vilt.named_parameters()}
    t_fisher = {n: a**2 + 0.05 for n, a in t_anchor.items()}

    full = torch.nn.ModuleDict({"vilt_encoder": vilt, "task_layer": head})
    full.train()
    opt, sched = _torch_optimizer(full)
    t_ids = torch.tensor(ids, dtype=torch.long)
    t_mask = torch.tensor(mask)
    t_px = torch.tensor(pixels).permute(0, 3, 1, 2)
    t_pm = torch.ones(B, H, W, dtype=torch.long)
    t_y = torch.tensor(labels, dtype=torch.long)

    def torch_penalty():
        return W_EWC * sum(
            (t_fisher[n] * (p - t_anchor[n]) ** 2).sum()
            for n, p in vilt.named_parameters()
        )

    ref_losses, ref_ewc = [], []
    for _ in range(STEPS):
        out = vilt(input_ids=t_ids, attention_mask=t_mask,
                   pixel_values=t_px, pixel_mask=t_pm)
        logits = head(out.pooler_output)
        task_loss = torch.nn.functional.cross_entropy(logits, t_y)
        loss = task_loss + torch_penalty()
        loss.backward()
        opt.step()
        sched.step()
        opt.zero_grad()
        ref_losses.append(float(task_loss.detach()))
        with torch.no_grad():
            ref_ewc.append(float(torch_penalty()))

    spec = HeadSpec(task_key="snli-ve", model_type="classification",
                    num_labels=NUM_LABELS, num_images=1, num_choices=None)
    batch = {
        "input_ids": jnp.asarray(ids),
        "text_mask": jnp.asarray(mask),
        "pixel_values": jnp.asarray(pixels),
        "patch_hw": jnp.asarray([[H // 32, W // 32]] * B, jnp.int32),
        "labels": jnp.asarray(labels),
    }
    anchor = jax.tree_util.tree_map(np.array, vilt_params)
    ewc_ref = EwcRef(
        fisher=jax.tree_util.tree_map(lambda a: jnp.asarray(a**2 + 0.05), anchor),
        anchor=jax.tree_util.tree_map(jnp.asarray, anchor),
        weight=jnp.asarray(W_EWC, jnp.float32),
    )
    my_losses, my_ewc = _my_trajectory(
        cfg, spec, "ce", vilt_params, head_params, batch, ewc_ref=ewc_ref
    )
    np.testing.assert_allclose(my_losses, ref_losses, rtol=1e-5, atol=1e-6)
    # post-update penalty: a sum of ~100k tiny squares, so f32 summation
    # order costs ~1e-4 relative (measured 1.25e-4); steps 1-2 are warmup
    # (lr=0) where the penalty is exactly 0, hence the absolute floor
    np.testing.assert_allclose(my_ewc, ref_ewc, rtol=5e-4, atol=1e-8)
    assert my_ewc[-1] > 0.0  # params moved off the anchor -> penalty engaged

    # the penalty must CHANGE the trajectory (gradient effect, not just
    # logging): rerun without ewc_ref and require divergence by the last step
    plain = _my_trajectory(cfg, spec, "ce", vilt_params, head_params, batch)
    assert abs(plain[-1] - my_losses[-1]) > 1e-7
