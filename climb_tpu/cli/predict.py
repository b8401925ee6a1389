"""Batched inference driver (serving path).

The reference has no standalone predict entry point — evaluation lives
inside each task trainer's loop (e.g. ``train_snli_ve.py:246-266``). This
driver makes the trained model servable: it loads a Phase I checkpoint
(native msgpack OR a reference ``torch.save`` file — auto-detected), runs a
task's eval split through ONE jitted fixed-shape forward, and writes
per-example predictions, the task metric, and measured throughput.

Usage:
  python -m climb_tpu.cli.predict --encoder_name vilt \\
      --ordered_cl_tasks vqa,nlvr2,snli-ve,vcr --task_key snli-ve \\
      --checkpoint out/.../checkpoints/task2_snli-ve/model \\
      --climb_data_dir /data/datasets/MCL --output_file preds.json
"""

import argparse
import json
import logging
import os
import time

import jax
import numpy as np

from climb_tpu.cli.common import add_common_args, add_tpu_args, setup_logging
from climb_tpu.configs import task_configs

logger = logging.getLogger(__name__)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder_name", required=True, type=str)
    parser.add_argument("--pretrained_model_name", default="scratch", type=str,
                        help="Base weights; the checkpoint overrides them.")
    parser.add_argument("--ordered_cl_tasks", required=True, type=str,
                        help="Task sequence the checkpoint was trained with "
                             "(determines which heads exist).")
    parser.add_argument("--task_key", required=True, type=str,
                        help="Which task head to run.")
    parser.add_argument("--checkpoint", default=None, type=str,
                        help="Model checkpoint (native msgpack or reference "
                             "torch save; auto-detected).")
    # adapter-trained checkpoints need the adapter modules rebuilt + the
    # task's adapter activated (reference re-activates adapters before eval,
    # evaluate_cl_algorithm.py:118-119)
    parser.add_argument("--cl_algorithm", default=None, type=str,
                        help="Set to 'adapter' for adapter-trained checkpoints.")
    parser.add_argument("--adapter_method", default="vanilla", choices=["vanilla"])
    parser.add_argument("--adapter_config", default="houlsby", type=str)
    parser.add_argument("--adapter_reduction_factor", type=int, default=0)
    parser.add_argument("--lora_rank", type=int, default=0,
                        help="LoRA rank override (adapter_config=lora; must "
                             "match the trained checkpoint).")
    parser.add_argument("--lora_alpha", type=float, default=0.0)
    parser.add_argument("--lora_targets", type=str, default="")
    parser.add_argument("--climb_data_dir", type=str, default=".")
    parser.add_argument("--input_jsonl", type=str, default=None,
                        help="Serve raw inputs instead of a dataset split: "
                             "one JSON object per line — single-image tasks "
                             '{"text", "image": path, "label"?}; nlvr2 '
                             '{"text", "images": [a, b], "label"?}; '
                             'multi-choice {"choices": [...], "image", "label"?}.')
    parser.add_argument("--output_file", type=str, default="predictions.json")
    parser.add_argument("--export_model", type=str, default=None,
                        help="Instead of predicting, lower the loaded "
                             "checkpoint's eval step with jax.export and "
                             "write ONE portable serving artifact (StableHLO "
                             "program + parameters + input signature) to "
                             "this path, then exit. Serve it with "
                             "--from_export (no model code needed).")
    parser.add_argument("--export_platforms", type=str, default="tpu,cpu",
                        help="Comma-separated lowering platforms for "
                             "--export_model (default: tpu,cpu — one "
                             "artifact serves both).")
    parser.add_argument("--export_batch_sizes", type=str, default=None,
                        help="Comma-separated batch-size LADDER for "
                             "--export_model (e.g. '1,8'): the artifact "
                             "carries one program per size plus the full "
                             "signature batch, and the HTTP server pads each "
                             "coalesced batch only to the smallest program "
                             "that fits it — low-load requests get small-"
                             "batch latency instead of full-batch latency.")
    parser.add_argument("--export_canvas_widths", type=str, default=None,
                        help="Comma-separated canvas-width LADDER for "
                             "--export_model (e.g. '288,512'; patch-size "
                             "multiples): the serving analog of aspect "
                             "bucketing — the HTTP server crops each batch's "
                             "pixel canvas to the smallest program width "
                             "holding every image's valid patches, so 4:3 "
                             "photos stop paying full-canvas FLOPs. Composes "
                             "with --export_batch_sizes (cross product).")
    parser.add_argument("--from_export", type=str, default=None,
                        help="Serve a --export_model artifact: no encoder "
                             "build, no checkpoint load — batch geometry, "
                             "parameters, and the compiled program all come "
                             "from the file.")
    parser.add_argument("--max_predictions", type=int, default=0,
                        help="Cap the prediction list in the output JSON "
                             "(0 = write all).")
    parser.add_argument("--quant_calibration_batches", type=int, default=8,
                        help="PTQ calibration batches for --dense_impl "
                             "int8_static (forwarded in bf16 recording "
                             "per-tensor activation ranges before serving "
                             "int8).")
    add_common_args(parser)
    add_tpu_args(parser)
    # inference default: bf16 compute (MXU-native; ~2x f32 throughput).
    # Training drivers keep f32 as the conservative default.
    parser.set_defaults(compute_dtype="bfloat16")
    return parser


def main(argv=None):
    setup_logging()
    from climb_tpu.cli.common import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    args.ordered_cl_tasks = args.ordered_cl_tasks.split(",")
    if args.tiny:  # tiny model config implies the tiny image canvas
        args.image_height, args.image_width = 64, 96
    assert args.task_key in args.ordered_cl_tasks, (
        f"--task_key {args.task_key} not in --ordered_cl_tasks"
    )
    if args.from_export:
        return _serve_from_export(args)
    if args.export_model:
        # an exported artifact has ONE fixed input signature; a bucketed
        # loader would export whichever cropped shape its first batch has —
        # unservable by --from_export (which forces the full geometry)
        for bucket_flag in ("aspect_buckets", "text_buckets"):
            if getattr(args, bucket_flag, None):
                logger.warning("--%s is incompatible with fixed-signature "
                               "--export_model; disabled", bucket_flag)
                setattr(args, bucket_flag, None)

    from climb_tpu.ckpt import load_params, partial_load
    from climb_tpu.train import LOSS_TYPES, create_cl_model, get_task_trainer_class
    from climb_tpu.train.train_step import make_eval_step

    adapter_handler = None
    if args.cl_algorithm == "adapter":
        from climb_tpu.cl.adapters import AdapterHandler

        adapter_handler = AdapterHandler(adapter_method=args.adapter_method, args=args)
    mesh = None
    if getattr(args, "use_mesh", False) and len(jax.devices()) > 1:
        # data-parallel serving: batches shard over the ('data','model')
        # mesh exactly as the training drivers' eval does
        from climb_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_model=getattr(args, "n_model", 1))
        logger.info("Serving over mesh %s", dict(mesh.shape))
    model = create_cl_model(args, task_configs, adapter_handler=adapter_handler,
                            mesh=mesh)
    if args.checkpoint and os.path.isfile(args.checkpoint):
        ckpt = load_params(args.checkpoint)
        merged, loaded, missing = partial_load(model.params, ckpt)
        model = model.with_params(merged)
        logger.info("Checkpoint %s: %d tensors loaded, %d kept from init",
                    args.checkpoint, len(loaded), len(missing))
    elif args.checkpoint:
        raise FileNotFoundError(args.checkpoint)
    if adapter_handler is not None:
        model = adapter_handler.activate_adapter_for_eval(args.task_key, model)

    trainer = None
    if not args.input_jsonl:
        trainer_cls = get_task_trainer_class(task_configs[args.task_key]["trainer"])
        trainer = trainer_cls(
            args, task_configs,
            model_config={"encoder_dim": model.cfg.hidden_size},
        )

    extra_vars = None
    if getattr(args, "dense_impl", "xla") == "int8_static":
        import itertools

        from climb_tpu.train.train_step import calibrate_quant_scales

        if args.input_jsonl:
            src = _jsonl_batches(args, model)
            gen = (b for _, b in src)
        else:
            src = iter(trainer.eval_dataloader)
            gen = (trainer._put(b, model.mesh) for b in src)
        quant_col = calibrate_quant_scales(
            model.module, args.task_key, model.params,
            itertools.islice(gen, max(1, args.quant_calibration_batches)),
            model.cfg.compute_dtype,
        )
        # islice abandons the stream mid-epoch: close it so the loader's
        # producer threads stop instead of prefetching for the whole run
        src.close()
        n_scales = len(jax.tree_util.tree_leaves(quant_col))
        logger.info("PTQ calibration: %d batches -> %d activation-range tensors",
                    args.quant_calibration_batches, n_scales)
        extra_vars = {"quant": quant_col}

    eval_step = make_eval_step(
        model.module, args.task_key, LOSS_TYPES[args.task_key],
        model.cfg.compute_dtype, extra_vars=extra_vars,
    )
    if args.export_model:
        return _do_export(args, model, trainer, eval_step)

    def run_fn(batch):
        return eval_step(model.params, batch)

    if args.input_jsonl:
        return _predict_from_jsonl(args, model, run_fn)
    return _predict_dataset(args, model, trainer, run_fn)


def _predict_dataset(args, model, trainer, run_fn):
    # bucketing (aspect/text) permutes the batch stream relative to dataset
    # order; capture the emission order so predictions can be inverted back
    # to example order (the output contract is predictions[i] == example i)
    loader = trainer.eval_dataloader
    order = loader.example_order() if loader.is_bucketed else None
    preds, total, count, n = [], 0.0, 0.0, 0
    t0 = None
    for batch in trainer.eval_dataloader:
        put = trainer._put(batch, model.mesh)
        logits, s, c = run_fn(put)
        if t0 is None:  # exclude compile time from throughput
            float(s)
            t0, n0 = time.perf_counter(), 0
        argmax = np.asarray(jax.numpy.argmax(logits, axis=-1))
        # drop padded rows of the final batch (eval loader pads to a fixed
        # shape) so predictions align 1:1 with dataset example order
        valid = np.asarray(batch["valid"]).astype(bool) if "valid" in batch else np.ones(argmax.shape[0], bool)
        preds.extend(argmax[valid].tolist())
        total += float(s)
        count += float(c)
        n += int(valid.sum())
    elapsed = max(time.perf_counter() - (t0 or time.perf_counter()), 1e-9)
    if order is not None:
        assert len(preds) == len(order), (len(preds), len(order))
        inverted = [0] * len(preds)
        for pos, ds_idx in enumerate(order):
            inverted[int(ds_idx)] = preds[pos]
        preds = inverted
    score = 100.0 * total / max(count, 1.0)
    ex_s = n / elapsed

    out = {
        "task_key": args.task_key,
        "checkpoint": args.checkpoint,
        "metric": score,
        "n_examples": n,
        "examples_per_sec": round(ex_s, 1),
        "predictions": preds[: args.max_predictions] if args.max_predictions else preds,
    }
    os.makedirs(os.path.dirname(args.output_file) or ".", exist_ok=True)
    with open(args.output_file, "w") as f:
        json.dump(out, f)
    logger.info("task=%s: metric=%.2f over %d examples (%.1f ex/s) -> %s",
                args.task_key, score, n, ex_s, args.output_file)
    return out


def _jsonl_batches(args, model):
    """Yield (chunk, device-ready batch) pairs for --input_jsonl rows through
    the AOT input processor (tokenize + canvas), fixed-shape batches. Shared
    by the prediction loop and PTQ calibration."""
    import jax.numpy as jnp

    from climb_tpu.data.loader import pad_batch
    from climb_tpu.data.processor import ViltInputProcessor
    from climb_tpu.data.tokenization import load_tokenizer
    from climb_tpu.train import LOSS_TYPES

    cfg = model.cfg
    spec = next(s for s in model.head_specs if s.task_key == args.task_key)
    loss_type = LOSS_TYPES[args.task_key]
    proc = ViltInputProcessor(
        load_tokenizer(getattr(args, "tokenizer", "bert-base-uncased"),
                       getattr(args, "vocab_path", None)),
        cfg.max_text_len, (cfg.image_height, cfg.image_width), cfg.patch_size,
    )

    with open(args.input_jsonl) as f:
        rows = [json.loads(line) for line in f if line.strip()]

    from climb_tpu.data.processor import build_raw_batch

    bs = args.batch_size
    for i in range(0, len(rows), bs):
        chunk = rows[i : i + bs]
        # same row schemas + image specs (path / {"b64": ...} / raw array)
        # as the HTTP server — one dispatch implementation for both
        batch = build_raw_batch(
            proc, spec.model_type, spec.num_images, chunk,
            num_choices=spec.num_choices,
        )
        labels = [r.get("label") for r in chunk]
        int_labels = np.asarray([l if l is not None else 0 for l in labels], np.int32)
        if loss_type == "vqa_bce":  # metric = soft score; one-hot from labels
            ts = np.zeros((len(chunk), spec.num_labels), np.float32)
            ts[np.arange(len(chunk)), int_labels] = 1.0
            batch["target_scores"] = ts
        else:
            batch["labels"] = int_labels
        batch = pad_batch(batch, bs)
        yield chunk, {k: jnp.asarray(v) for k, v in batch.items()}


def _predict_from_jsonl(args, model, run_fn):
    """Serve raw JSONL inputs: one jitted forward per fixed-shape batch."""
    import jax.numpy as jnp

    preds, total, count = [], 0.0, 0.0
    have_labels = True
    t0 = None
    n_rows = 0
    for chunk, batch in _jsonl_batches(args, model):
        have_labels = have_labels and all(r.get("label") is not None for r in chunk)
        n_rows += len(chunk)
        logits, s, c = run_fn(batch)
        if t0 is None:
            float(s)
            t0 = time.perf_counter()
        preds.extend(np.asarray(jnp.argmax(logits, axis=-1))[: len(chunk)].tolist())
        total += float(s)
        count += float(c)
    elapsed = max(time.perf_counter() - (t0 or time.perf_counter()), 1e-9)

    out = {
        "task_key": args.task_key,
        "checkpoint": args.checkpoint,
        "metric": (100.0 * total / max(count, 1.0)) if have_labels else None,
        "n_examples": n_rows,
        "examples_per_sec": round(n_rows / elapsed, 1),
        "predictions": preds[: args.max_predictions] if args.max_predictions else preds,
    }
    os.makedirs(os.path.dirname(args.output_file) or ".", exist_ok=True)
    with open(args.output_file, "w") as f:
        json.dump(out, f)
    logger.info("task=%s: %d raw examples, metric=%s (%.1f ex/s) -> %s",
                args.task_key, n_rows, out["metric"], out["examples_per_sec"],
                args.output_file)
    return out


def _do_export(args, model, trainer, eval_step):
    """--export_model: lower the eval step for a fixed batch signature and
    write the single-file serving artifact (program + params + signature)."""
    from climb_tpu.serve.export import export_eval_step, make_predict_meta
    from climb_tpu.train import LOSS_TYPES

    if args.input_jsonl:
        src = _jsonl_batches(args, model)
        _, batch = next(src)
    else:
        src = iter(trainer.eval_dataloader)
        batch = trainer._put(next(src), model.mesh)
    src.close()  # one example batch fixes the signature; stop the producer
    spec = next(s for s in model.head_specs if s.task_key == args.task_key)
    meta = make_predict_meta(model, args, spec, LOSS_TYPES[args.task_key])
    # signature batch dim comes from the batch actually served (the eval
    # loader may use --eval_batch_size), not the training batch size flag
    meta["batch_size"] = int(np.shape(next(iter(batch.values())))[0])
    platforms = tuple(p for p in args.export_platforms.split(",") if p)
    ladder = None
    if getattr(args, "export_batch_sizes", None):
        ladder = [int(b) for b in args.export_batch_sizes.split(",") if b]
    widths = None
    if getattr(args, "export_canvas_widths", None):
        widths = [int(w) for w in args.export_canvas_widths.split(",") if w]
    meta = export_eval_step(
        eval_step, model.params, batch, args.export_model, meta, platforms,
        batch_sizes=ladder, canvas_widths=widths,
    )
    return meta


def _serve_from_export(args):
    """--from_export: run predictions from an artifact alone — no encoder
    build, no checkpoint; geometry and params come from the file."""
    from climb_tpu.serve import ExportedModel
    from climb_tpu.serve.export import predict_shim
    from climb_tpu.train import get_task_trainer_class

    exported = ExportedModel(args.from_export)
    meta = exported.meta
    if args.task_key != meta["task_key"]:
        raise ValueError(
            f"--task_key {args.task_key} != artifact task '{meta['task_key']}'"
        )
    # force the input geometry to the exported fixed-shape signature
    args.batch_size = int(meta["batch_size"])
    args.eval_batch_size = int(meta["batch_size"])
    args.image_height = int(meta["image_height"])
    args.image_width = int(meta["image_width"])
    args.max_text_len = int(meta["max_text_len"])
    if getattr(args, "text_buckets", None):
        logger.warning("--text_buckets is incompatible with fixed-signature "
                       "--from_export serving; disabled")
        args.text_buckets = None
    # aspect bucketing IS servable when the artifact carries a canvas-width
    # ladder (--export_canvas_widths): the loader groups + crops batches by
    # width and each batch routes to its width's program. Batches the loader
    # safety-widened past a ladder width pad up via fit_batch (lossless).
    widths = getattr(exported, "canvas_widths", None) or ()
    if len(widths) > 1:
        if getattr(args, "aspect_buckets", None):
            logger.info("--from_export: snapping --aspect_buckets to the "
                        "artifact's width ladder %s", list(widths))
        args.aspect_buckets = tuple(widths)
        logger.info("--from_export: aspect bucketing over the artifact's "
                    "canvas-width ladder %s", list(widths))
    elif getattr(args, "aspect_buckets", None):
        logger.warning("--aspect_buckets needs an artifact exported with "
                       "--export_canvas_widths; disabled")
        args.aspect_buckets = None
    args.checkpoint = args.from_export  # for the output-JSON provenance field
    model = predict_shim(meta)

    run_fn = (
        (lambda b: exported(exported.fit_batch(b))) if len(widths) > 1
        else exported
    )
    if args.input_jsonl:
        return _predict_from_jsonl(args, model, run_fn)
    trainer_cls = get_task_trainer_class(task_configs[args.task_key]["trainer"])
    trainer = trainer_cls(
        args, task_configs, model_config={"encoder_dim": int(meta["hidden_size"])}
    )
    return _predict_dataset(args, model, trainer, run_fn)


if __name__ == "__main__":
    main()
