"""Optimizer + LR schedule (parity: reference vilt.py:205-215 and
``get_polynomial_decay_schedule_with_warmup`` usage, train_snli_ve.py:183-189).

- AdamW, betas (0.9, 0.98), task-config eps, grouped weight decay excluding
  biases and LayerNorm parameters (reference vilt.py:209-213).
- Linear warmup over ``warmup_ratio * total_steps`` then polynomial (power=1)
  decay to lr_end=0.
- Trainability masks (freeze-encoder / freeze-bottom-k / adapter-only) are
  float pytrees multiplied into the *final updates* (not just the gradients),
  so frozen parameters receive neither gradient nor weight-decay updates.
  Per-leaf arrays support partial freezing of nn.scan-stacked layers
  (a (num_layers, 1, ...) mask freezes the bottom k of a stacked leaf).
"""

from typing import Optional

import jax
import optax


def polynomial_warmup_schedule(
    lr: float, total_steps: int, warmup_ratio: float = 0.1, lr_end: float = 0.0, power: float = 1.0
) -> optax.Schedule:
    warmup_steps = int(total_steps * warmup_ratio)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, jnp.float32)
        warm = lr * step / jnp.maximum(warmup_steps, 1)
        frac = 1.0 - (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        frac = jnp.clip(frac, 0.0, 1.0)
        decay = (lr - lr_end) * frac**power + lr_end
        return jnp.where(step < warmup_steps, warm, decay)

    return schedule


def weight_decay_mask(params) -> dict:
    """True where weight decay applies — the reference's EXACT grouping.

    Reference (vilt.py:209-213): ``no_decay = ['bias', 'LayerNorm.weight']``
    substring-matched against torch parameter names. On HF ViltModel that
    excludes all biases and ONLY ``text_embeddings.LayerNorm.weight`` — the
    encoder layer norms are lowercase (``layernorm_before/after.weight``),
    the final ``layernorm.weight`` likewise, and head LayerNorms appear as
    ``task_layer.<k>.1.weight``, so the reference DECAYS all of those.
    Faithfully: decay everything except biases, the text-embeddings LN scale,
    and BERT-subtree LN scales (HF BertModel LNs are capital ``LayerNorm`` —
    moot in practice since the BERT side is frozen).
    """

    def keep(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if names[-1] == "bias":
            return False
        if names[-1] == "scale":
            if len(names) > 1 and names[-2] == "text_layernorm":
                return False
            if "bert" in names:
                return False
        return True

    return jax.tree_util.tree_map_with_path(keep, params)


def apply_update_mask(mask) -> optax.GradientTransformation:
    """Multiply final updates by a float mask pytree (1=train, 0=frozen)."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        masked = jax.tree_util.tree_map(lambda u, m: u * m, updates, mask)
        return masked, state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    params,
    lr: float,
    total_steps: int,
    warmup_ratio: float = 0.1,
    weight_decay: float = 1e-2,
    adam_epsilon: float = 1e-8,
    b1: float = 0.9,
    b2: float = 0.98,
    trainable_mask: Optional[dict] = None,
    max_grad_norm: Optional[float] = None,
    skip_nonfinite: int = 0,
    moments_dtype: Optional[str] = None,
) -> optax.GradientTransformation:
    """``skip_nonfinite > 0`` guards production bf16 runs against loss
    spikes: a step whose gradients contain NaN/inf is SKIPPED (params and
    AdamW moments untouched, schedule still advances) instead of poisoning
    the whole parameter tree; after that many consecutive bad steps the
    update applies anyway so a persistent failure surfaces rather than
    looping silently. Finite-gradient trajectories match the unguarded
    optimizer (to 1 ULP of compiled op reordering) with the guard on.
    Skip count: ``nonfinite_skips(opt_state)``.

    ``moments_dtype='bfloat16'`` stores AdamW's first moment (mu) in bf16 —
    25% less optimizer HBM (mu is 1 of 4 state+param copies); the second
    moment stays f32 (squared-gradient dynamic range doesn't survive bf16).
    Accumulation still happens in f32 (optax casts per update)."""
    schedule = polynomial_warmup_schedule(lr, total_steps, warmup_ratio)
    chain = []
    if max_grad_norm is not None:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(
        optax.adamw(
            schedule,
            b1=b1,
            b2=b2,
            eps=adam_epsilon,
            weight_decay=weight_decay,
            mask=weight_decay_mask(params),
            mu_dtype=moments_dtype,
        )
    )
    if trainable_mask is not None:
        chain.append(apply_update_mask(trainable_mask))
    tx = optax.chain(*chain)
    if skip_nonfinite:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=int(skip_nonfinite))
    return tx


def nonfinite_skips(opt_state) -> int:
    """Total updates skipped by the ``skip_nonfinite`` guard (0 if off)."""
    if isinstance(opt_state, optax.ApplyIfFiniteState):
        return int(opt_state.total_notfinite)
    return 0
