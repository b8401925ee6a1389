"""The one jitted train-step transform.

The reference implements four near-identical trainer loops
(train_vqa/nlvr2/snli_ve/vcr — SURVEY.md section 2.2); here a single factory
produces the jitted step for any (task, loss type): forward -> loss
[-> + EWC penalty] -> grad -> AdamW update, with the batch sharded over the
'data' mesh axis and parameters per the TP rules (collectives inserted by
XLA).

Loss parity:
- 'ce'        — cross-entropy over classification logits (NLVR2/SNLI-VE,
                reference train_snli_ve.py:140)
- 'vqa_bce'   — BCEWithLogits(reduction='mean') * num_labels on soft targets
                (reference train_vqa.py:95,157) == per-example sum of
                elementwise BCE, averaged over batch
- 'mc_ce'     — cross-entropy over (B, num_choices) scores (reference
                train_vcr.py)
- 'bce_multilabel' — mean BCEWithLogits over 80-way multi-hot targets
                (reference train_vision.py coco-cls)
"""

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from climb_tpu.ops.image_ops import normalize_images


class EwcRef(NamedTuple):
    """Snapshot of a previous task: diagonal Fisher + anchor params (encoder
    subtree), plus the penalty weight (reference ewc.py:75-87)."""

    fisher: dict
    anchor: dict
    weight: jax.Array


class FdRef(NamedTuple):
    """Feature-distillation teacher (cl/distill.py — beyond-reference
    algorithm): full param tree of the end-of-previous-task model, plus the
    penalty weight. The penalty anchors the CURRENT batch's encoder features
    to the teacher's — schema-free (works for every head type), unlike
    logit distillation which needs matching task heads."""

    teacher: dict
    weight: jax.Array


def prepare_batch(batch: dict, compute_dtype=jnp.float32) -> dict:
    """Normalize uint8 pixels on-device; pass floats through unchanged."""
    out = dict(batch)
    pv = out.get("pixel_values")
    if pv is not None and pv.dtype == jnp.uint8:
        out["pixel_values"] = normalize_images(pv, dtype=compute_dtype)
    return out


def compute_loss(logits, batch, loss_type: str):
    """Mean per-example loss over VALID rows only.

    The fixed-shape pipeline zero-pads the final partial batch of an epoch
    (``pad_batch``); the reference's dynamic batching has no such rows, so
    they must not contribute gradient. With no padding ('valid' absent or
    all-ones) this is exactly the unmasked mean.
    """
    lsum, count = compute_loss_sum(logits, batch, loss_type)
    return lsum / jnp.maximum(count, 1.0)


def compute_loss_sum(logits, batch, loss_type: str):
    """(masked per-example loss SUM, valid count) — the unnormalized form,
    so gradient accumulation can divide by the GLOBAL valid count and stay
    exactly equal to the whole-batch masked mean."""
    valid = batch.get("valid")
    if valid is None:
        valid = jnp.ones((logits.shape[0],), jnp.float32)
    valid = valid.astype(jnp.float32)

    if loss_type in ("ce", "mc_ce"):
        per_ex = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), batch["labels"]
        )
    elif loss_type == "vqa_bce":
        # reference: BCEWithLogits(reduction='mean') * num_labels over a real
        # batch == per-example elementwise-BCE sum, averaged over the batch
        # (train_vqa.py:95,157)
        per_ex = optax.sigmoid_binary_cross_entropy(
            logits.astype(jnp.float32), batch["target_scores"]
        ).sum(axis=-1)
    elif loss_type == "bce_multilabel":
        per_ex = optax.sigmoid_binary_cross_entropy(
            logits.astype(jnp.float32), batch["labels"].astype(jnp.float32)
        ).mean(axis=-1)
    else:
        raise ValueError(f"unknown loss_type {loss_type}")
    return (per_ex * valid).sum(), valid.sum()


def batch_metric(logits, batch, loss_type: str):
    """Summed (not averaged) correctness for the batch + example count.

    A 'valid' {0,1} vector in the batch masks padding examples (the pipeline
    pads the last partial batch to keep shapes static).
    """
    valid = batch.get("valid")
    if valid is None:
        valid = jnp.ones((logits.shape[0],), jnp.float32)
    valid = valid.astype(jnp.float32)
    if loss_type == "vqa_bce":
        # VQA soft score of the argmax answer (reference train_vqa.py:99-113).
        pred = jnp.argmax(logits, axis=-1)
        score = jnp.take_along_axis(batch["target_scores"], pred[:, None], axis=1)[:, 0]
        return (score * valid).sum(), valid.sum()
    if loss_type == "bce_multilabel":
        # micro-F1 is computed host-side from the returned logits.
        return jnp.zeros(()), valid.sum()
    correct = (jnp.argmax(logits, axis=-1) == batch["labels"]).astype(jnp.float32)
    return (correct * valid).sum(), valid.sum()


def fd_penalty_sum(feats, teacher_feats, valid) -> jax.Array:
    """Masked SUM over examples of the mean-squared feature distance (the
    caller divides by its valid-count denominator so grad accumulation stays
    exact, mirroring compute_loss_sum)."""
    per_ex = (
        (feats.astype(jnp.float32) - teacher_feats.astype(jnp.float32)) ** 2
    ).mean(axis=-1)
    return (per_ex * valid).sum()


def _valid_vec(batch, n):
    valid = batch.get("valid")
    if valid is None:
        return jnp.ones((n,), jnp.float32)
    return valid.astype(jnp.float32)


def ewc_penalty(params_encoder: dict, ewc_ref: EwcRef) -> jax.Array:
    sq = jax.tree_util.tree_map(
        lambda f, p, a: (f * (p - a) ** 2).sum(),
        ewc_ref.fisher,
        params_encoder,
        ewc_ref.anchor,
    )
    return ewc_ref.weight * sum(jax.tree_util.tree_leaves(sq))


def _encoder_subtree(params: dict) -> dict:
    # The CL model's encoder lives under 'vilt' (ViltContinualLearner.setup)
    # or 'viltbert' (ViltBertContinualLearner.setup).
    for key in ("vilt", "viltbert"):
        if key in params:
            return params[key]
    return params


# Microbatch token budget for the auto grad-accum policy, fit to v5e
# measurements (exp_scripts/bench_accum_width.py): the optimum microbatch
# shrinks as the live activation set per sequence grows —
#   S=281 -> microbatch 16 (4496 tok), S=209-217 -> 32 (~6.8k),
#   S=125 -> whole batch 64 (8000 tok);
# i.e. "largest microbatch whose encoder-token count stays <= ~8k".
AUTO_ACCUM_TOKEN_BUDGET = 8000


def auto_grad_accum(seq_len: int, n_seqs: int,
                    token_budget: int = None) -> int:
    """Pick grad_accum_steps for a batch of ``n_seqs`` encoder sequences of
    length ``seq_len``: the smallest power-of-2 divisor of ``n_seqs`` whose
    microbatch holds <= ``token_budget`` encoder tokens (falling back to the
    largest power-of-2 divisor when even that is over budget). Any accum
    value yields the same optimizer trajectory (tests/test_grad_accum.py);
    this only picks the fastest schedule per bucketed batch shape."""
    if token_budget is None:  # late-bound so the module constant is patchable
        token_budget = AUTO_ACCUM_TOKEN_BUDGET
    accum = 1
    while (n_seqs // accum) * seq_len > token_budget and n_seqs % (accum * 2) == 0:
        accum *= 2
    return accum


def batch_shape_signature(batch: dict, patch_size: int):
    """(per-pass seq_len, encoder-seq count incl. fold, splittable batch
    size) for a concrete (possibly bucketed) batch — the shape facts every
    accum policy keys on (shared with accum_tune's sweep cache so the two
    can never disagree on what 'same shape' means)."""
    ids = batch["input_ids"]
    pv = batch["pixel_values"]
    text_len = ids.shape[-1]
    h, w = (pv.shape[-3], pv.shape[-2])
    seq_len = text_len + 1 + (h // patch_size) * (w // patch_size)
    n_seqs = ids.shape[0]
    if ids.ndim == 3:  # multi-choice fold (B, C, L)
        n_seqs *= ids.shape[1]
    elif pv.ndim == 5:  # image-pair fold (B, 2, H, W, 3)
        n_seqs *= pv.shape[1]
    return seq_len, n_seqs, ids.shape[0]


def auto_grad_accum_for_batch(batch: dict, patch_size: int,
                              token_budget: int = None) -> int:
    """Derive the auto accum from a concrete batch's (possibly bucketed)
    shapes: per-pass sequence length = text_len + [CLS] + patch count, and
    the encoder-sequence count includes the image-pair / multi-choice fold."""
    seq_len, n_seqs, bs = batch_shape_signature(batch, patch_size)
    # accum splits the BATCH axis, so it must divide batch size; fold
    # multiplies sequences per microbatch but not the splittable axis
    accum = auto_grad_accum(seq_len, n_seqs, token_budget)
    while bs % accum:
        accum //= 2
    return max(1, accum)


def make_forward_fn(model, task_key: Optional[str], extra_vars=None) -> Callable:
    """Uniform forward closure over CL models (task dispatch) and classifiers.

    extra_vars: additional variable collections to thread through apply
    (e.g. {"quant": <calibrated scales>} for the int8_static serving path).
    """
    ev = dict(extra_vars or {})
    if task_key is None:
        return lambda params, batch, **kw: model.apply(
            {"params": params, **ev}, batch, **kw)
    return lambda params, batch, **kw: model.apply(
        {"params": params, **ev}, task_key, batch, **kw)


def make_train_step(model, task_key: Optional[str], loss_type: str, compute_dtype=jnp.float32,
                    grad_accum_steps: int = 1, accum_unroll: int = 1):
    """Build the jitted train step. Call as step(state, batch, rng[, ewc_ref]).

    grad_accum_steps > 1 splits the batch into that many microbatches and
    averages their gradients inside one jitted step (a lax.scan) — identical
    optimizer trajectory to the whole-batch step, and on v5e the smaller live
    activation sets schedule ~20% faster (exp_scripts/bench_sweep.py).
    accum_unroll unrolls that scan so XLA may overlap one microbatch's
    forward with the previous one's backward.

    fd_ref (FdRef) adds the feature-distillation penalty: the student's
    encoder features on the batch are pulled toward a frozen teacher's
    (one extra deterministic teacher forward per step when active).
    """
    forward = make_forward_fn(model, task_key)

    def forward_feats(params, batch, **kw):
        return model.apply({"params": params}, task_key, batch,
                           method="forward_with_features", **kw)

    def fd_loss_sum(params, batch, rng, fd_ref):
        """(masked fd SUM, student logits) — one student forward serves both
        the task loss and the feature penalty."""
        logits, feats = forward_feats(
            params, batch, deterministic=False, rngs={"dropout": rng}
        )
        t_feats = jax.lax.stop_gradient(
            forward_feats(fd_ref.teacher, batch, deterministic=True)[1]
        )
        valid = _valid_vec(batch, logits.shape[0])
        return fd_ref.weight * fd_penalty_sum(feats, t_feats, valid), logits

    def loss_fn(params, batch, rng, ewc_ref, fd_ref):
        fd = jnp.zeros((), jnp.float32)
        if fd_ref is not None:
            fd_sum, logits = fd_loss_sum(params, batch, rng, fd_ref)
            fd = fd_sum / jnp.maximum(_valid_vec(batch, logits.shape[0]).sum(), 1.0)
        else:
            logits = forward(
                params, batch, deterministic=False, rngs={"dropout": rng}
            )
        loss = compute_loss(logits, batch, loss_type)
        penalty = jnp.zeros((), jnp.float32)
        if ewc_ref is not None:
            penalty = ewc_penalty(_encoder_subtree(params), ewc_ref)
        return loss + penalty + fd, (loss, logits, fd)

    def accumulate_grads(params, batch, rng, ewc_ref, fd_ref):
        if grad_accum_steps <= 1:
            grads, (loss, logits, fd) = jax.grad(loss_fn, has_aux=True)(
                params, batch, rng, ewc_ref, fd_ref
            )
            return grads, loss, logits, fd

        def micro(b):
            return {k: v.reshape((grad_accum_steps, -1) + v.shape[1:]) for k, v in b.items()}

        micro_batches = micro(batch)
        rngs = jax.random.split(rng, grad_accum_steps)
        # global valid count BEFORE the scan: each microbatch contributes its
        # masked loss SUM / denom_total (+ penalty/k), so accumulated grads
        # and loss equal the whole-batch masked mean EXACTLY even when the
        # padded final batch leaves microbatches with unequal valid counts
        valid = batch.get("valid")
        denom = (
            valid.astype(jnp.float32).sum() if valid is not None
            else jnp.asarray(batch["input_ids"].shape[0], jnp.float32)
        )
        denom = jnp.maximum(denom, 1.0)

        def scaled_loss_fn(params, mb, r, ewc_ref, fd_ref):
            fd_scaled = jnp.zeros((), jnp.float32)
            if fd_ref is not None:
                fd_sum, logits = fd_loss_sum(params, mb, r, fd_ref)
                fd_scaled = fd_sum / denom
            else:
                logits = forward(params, mb, deterministic=False, rngs={"dropout": r})
            lsum, _ = compute_loss_sum(logits, mb, loss_type)
            data_loss = lsum / denom
            loss = data_loss + fd_scaled
            if ewc_ref is not None:
                loss = loss + ewc_penalty(_encoder_subtree(params), ewc_ref) / grad_accum_steps
            return loss, (data_loss, logits, fd_scaled)

        def body(carry, xs):
            acc, loss_acc, fd_acc = carry
            mb, r = xs
            g, (data_loss, logits, fd_scaled) = jax.grad(scaled_loss_fn, has_aux=True)(
                params, mb, r, ewc_ref, fd_ref
            )
            acc = jax.tree_util.tree_map(jnp.add, acc, g)
            return (acc, loss_acc + data_loss, fd_acc + fd_scaled), logits

        zeros = jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, jnp.float32), params)
        (grads, loss_sum, fd_sum), logits = jax.lax.scan(
            body,
            (zeros, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32)),
            (micro_batches, rngs),
            unroll=min(accum_unroll, grad_accum_steps),
        )
        logits = logits.reshape((-1,) + logits.shape[2:])
        return grads, loss_sum, logits, fd_sum

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng, ewc_ref=None, fd_ref=None):
        batch = prepare_batch(batch, compute_dtype)
        grads, loss, logits, fd = accumulate_grads(
            state.params, batch, rng, ewc_ref, fd_ref
        )
        new_state = state.apply_gradients(grads)
        metric_sum, metric_count = batch_metric(logits, batch, loss_type)
        metrics = {
            "loss": loss,
            "metric_sum": metric_sum,
            "metric_count": metric_count,
        }
        if ewc_ref is not None:
            # logged separately like the reference (train_snli_ve.py:212-216)
            metrics["ewc_loss"] = ewc_penalty(_encoder_subtree(new_state.params), ewc_ref)
        if fd_ref is not None:
            metrics["distill_loss"] = fd
        return new_state, metrics

    return train_step


def make_grad_fn(model, task_key: Optional[str], loss_type: str, compute_dtype=jnp.float32):
    """Plain loss+grad (no update) — used for EWC Fisher accumulation
    (reference ewc.py:59-71 runs train_step without an optimizer)."""
    forward = make_forward_fn(model, task_key)

    @jax.jit
    def grad_step(params, batch, rng):
        batch = prepare_batch(batch, compute_dtype)

        def loss_fn(p):
            logits = forward(p, batch, deterministic=False, rngs={"dropout": rng})
            return compute_loss(logits, batch, loss_type)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, grads

    return grad_step


def make_replay_step(model, task_key: Optional[str], loss_type: str, tx, compute_dtype=jnp.float32):
    """Experience-replay step with a *fresh* optimizer state every call.

    Parity quirk: the reference constructs a brand-new AdamW per replay step
    (experience_replay.py:61), i.e. zero first/second moments. Reproduced
    here by initializing opt state inside the step (cheap: zeros).
    """
    forward = make_forward_fn(model, task_key)

    @jax.jit
    def replay_step(params, batch, rng):
        batch = prepare_batch(batch, compute_dtype)

        def loss_fn(p):
            logits = forward(p, batch, deterministic=False, rngs={"dropout": rng})
            return compute_loss(logits, batch, loss_type)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        opt_state = tx.init(params)
        updates, _ = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    return replay_step


def calibrate_quant_scales(model, task_key: Optional[str], params, batches,
                           compute_dtype=jnp.float32):
    """PTQ calibration for the int8_static serving path: forward `batches`
    (an iterable of host batches) with the 'quant' variable collection
    mutable so every quantized dense records its running activation abs-max
    (computation itself runs in the normal compute dtype). Returns the
    calibrated collection, to be served via
    ``make_eval_step(..., extra_vars={"quant": scales})``."""
    forward = make_forward_fn(model, task_key)

    @jax.jit
    def first(params, batch):
        batch = prepare_batch(batch, compute_dtype)
        _, mut = forward(params, batch, deterministic=True, mutable=["quant"])
        return mut["quant"]

    @jax.jit
    def accum(params, qcol, batch):
        batch = prepare_batch(batch, compute_dtype)
        _, mut = make_forward_fn(model, task_key, extra_vars={"quant": qcol})(
            params, batch, deterministic=True, mutable=["quant"]
        )
        return mut["quant"]

    it = iter(batches)
    qcol = first(params, next(it))
    for b in it:
        qcol = accum(params, qcol, b)
    return qcol


def make_eval_step(model, task_key: Optional[str], loss_type: str, compute_dtype=jnp.float32,
                   extra_vars=None):
    forward = make_forward_fn(model, task_key, extra_vars=extra_vars)

    @jax.jit
    def eval_step(params, batch):
        batch = prepare_batch(batch, compute_dtype)
        logits = forward(params, batch, deterministic=True)
        metric_sum, metric_count = batch_metric(logits, batch, loss_type)
        return logits, metric_sum, metric_count

    return eval_step
