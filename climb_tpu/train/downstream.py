"""Shared Phase II downstream training loop (language-only and vision-only).

Factors the identical loops of reference ``train_language.py:149-198`` and
``train_vision.py:146-259``: AdamW + poly-warmup from the task config, eval
on the dev set only when ``epoch > 5 and epoch % 2 == 0`` (reference quirk),
best-model selection, final test eval, and the nested
``{task}_{upstream}_results.json`` output keyed ``nshot-N/seed-S ->
(test, dev, best_epoch)``.
"""

import json
import logging
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from climb_tpu.data.collation import stack_collate
from climb_tpu.data.loader import DataLoader
from climb_tpu.train.optimizer import make_optimizer
from climb_tpu.train.train_state import TrainState
from climb_tpu.train.train_step import make_eval_step, make_train_step

logger = logging.getLogger(__name__)


def upstream_name_from_checkpoint(checkpoint_name: str) -> str:
    """Reference naming quirk (train_language.py:51-57)."""
    parts = checkpoint_name.split("/")
    name = parts[-2] if len(parts) >= 2 else checkpoint_name
    for short in ["adapter", "ewc", "replay", "sequent", "bottom9"]:
        if short in checkpoint_name:
            name += f"_{short}"
            break
    return name


def micro_f1(all_labels: np.ndarray, all_preds: np.ndarray) -> float:
    tp = float(np.logical_and(all_preds, all_labels).sum())
    fp = float(np.logical_and(all_preds, ~all_labels).sum())
    fn = float(np.logical_and(~all_preds, all_labels).sum())
    denom = 2 * tp + fp + fn
    return 100.0 * 2 * tp / denom if denom > 0 else 0.0


def eval_classifier(model_module, params, dataset, batch_size, loss_type, compute_dtype,
                    extra_batch=None, num_workers=2):
    """Accuracy (or micro-F1 for multilabel) over a dataset."""
    eval_step = make_eval_step(model_module, None, loss_type, compute_dtype)
    loader = DataLoader(dataset, batch_size, stack_collate, shuffle=False, num_workers=num_workers)
    if loss_type == "bce_multilabel":
        labels_all, preds_all = [], []
        for batch in loader:
            valid = batch["valid"].astype(bool)
            b = dict(batch, **(extra_batch or {}))
            b = {k: jnp.asarray(v) for k, v in b.items()}
            logits, _, _ = eval_step(params, b)
            preds = np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32))) > 0.5
            labels_all.append(np.asarray(batch["labels"]).astype(bool)[valid])
            preds_all.append(preds[valid])
        return micro_f1(np.concatenate(labels_all), np.concatenate(preds_all))
    total, count = 0.0, 0.0
    for batch in loader:
        b = dict(batch, **(extra_batch or {}))
        b = {k: jnp.asarray(v) for k, v in b.items()}
        _, s, c = eval_step(params, b)
        total += float(s)
        count += float(c)
    return 100.0 * total / max(count, 1.0)


def train_downstream(args, model_module, params, task_config, datasets, loss_type,
                     compute_dtype, extra_batch=None, eval_batch_size=256,
                     trainable_mask=None):
    """Train a ViltClassifier; returns (best_dev, test_score, best_epoch, params).

    ``trainable_mask`` (float pytree) zeroes optimizer updates for frozen
    subtrees — the ViLT-BERT drivers pass ``viltbert_frozen_mask`` so the
    frozen BERT text side never moves (reference viltbert.py:115-120)."""
    train_ds, val_ds, test_ds = datasets
    num_epochs = task_config["num_epochs"]
    from climb_tpu.data.loader import parse_bucket_widths, parse_text_buckets

    buckets = parse_bucket_widths(
        getattr(args, "aspect_buckets", None),
        canvas_width=getattr(args, "image_width", 640),
    )
    tbuckets = parse_text_buckets(
        getattr(args, "text_buckets", None),
        max_text_len=getattr(args, "max_text_len", 40),
    )
    train_loader = DataLoader(
        train_ds, args.batch_size, stack_collate, shuffle=True,
        seed=args.seed, num_workers=getattr(args, "num_workers", 2),
        bucket_widths=buckets,
        text_bucket_lens=tbuckets,
    )
    max_steps = len(train_loader) * num_epochs
    tx = make_optimizer(
        params,
        lr=task_config["lr"],
        total_steps=max_steps,
        warmup_ratio=task_config["warmup_ratio"],
        weight_decay=task_config["weight_decay"],
        adam_epsilon=task_config["adam_epsilon"],
        trainable_mask=trainable_mask,
    )
    state = TrainState.create(apply_fn=model_module.apply, params=params, tx=tx)
    train_step = make_train_step(model_module, None, loss_type, compute_dtype)

    eval_bs = min(eval_batch_size, args.batch_size * 4)
    rng = jax.random.PRNGKey(args.seed)
    best_score, best_epoch, best_params = 0.0, 0, None
    eval_gate = getattr(args, "eval_every_epoch", False)
    for epoch in range(1, num_epochs + 1):
        train_loader.set_epoch(epoch)
        t0, seen = time.time(), 0
        for batch in train_loader:
            b = dict(batch, **(extra_batch or {}))
            b = {k: jnp.asarray(v) for k, v in b.items()}
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, b, sub)
            seen += args.batch_size
        # reference eval gate: epoch > 5 and epoch % 2 == 0
        if eval_gate or (epoch > 5 and epoch % 2 == 0) or epoch == num_epochs:
            score = eval_classifier(
                model_module, state.params, val_ds, eval_bs, loss_type,
                compute_dtype, extra_batch,
            )
            logger.info("epoch %d dev=%.2f (%.1f ex/s)", epoch, score, seen / max(time.time() - t0, 1e-6))
            if score > best_score or best_params is None:
                best_score, best_epoch = score, epoch
                best_params = jax.device_get(state.params)

    test_score = eval_classifier(
        model_module, best_params, test_ds, eval_bs, loss_type, compute_dtype, extra_batch
    )
    logger.info("best dev=%.2f (epoch %d) test=%.2f", best_score, best_epoch, test_score)
    return best_score, test_score, best_epoch, best_params


def write_downstream_results(n_shot, subsample_seed, best_score, test_score, best_epoch,
                             task_name, upstream_name, output_dir):
    """Nested results json (reference write_results, train_language.py:181-198)."""
    tree = lambda: defaultdict(tree)  # noqa: E731
    all_scores = tree()
    out_fn = os.path.join(output_dir, f"{task_name}_{upstream_name}_results.json")
    if os.path.exists(out_fn):
        with open(out_fn) as f:
            for k, v in json.load(f).items():
                all_scores[k] = v
    all_scores[f"nshot-{n_shot}"][f"seed-{subsample_seed}"] = (test_score, best_score, best_epoch)
    with open(out_fn, "w") as f:
        f.write(json.dumps(all_scores))
    return out_fn
