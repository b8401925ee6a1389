"""Phase II driver: language-only low-shot transfer.

Parity: reference ``src/train/train_language.py`` — loads an upstream
*encoder* checkpoint, builds a sequence-classification or multiple-choice
classifier over it, feeds the COCO mean image as the vacuous visual input
(broadcast across the batch), reallocates text/image sequence budget when
max_len > 40 (128x128 image), trains with n-shot class-balanced subsampling,
and writes nested ``{task}_{upstream}_results.json``.
"""

import argparse
import logging
import os

from climb_tpu.cli.common import (
    add_common_args,
    add_tpu_args,
    apply_task_config_overrides,
    enable_compilation_cache,
    setup_logging,
)
from climb_tpu.configs import model_configs, task_configs
from climb_tpu.utils import set_seed

logger = logging.getLogger(__name__)

MC_TASKS = {"commonsenseqa", "hellaswag", "piqa", "cosmosqa"}


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task_name", required=True, type=str,
                        help="The name of the language-only task.")
    parser.add_argument("--encoder_name", required=True, type=str,
                        help="The name of the base pretrained encoder.")
    parser.add_argument("--model_catog", default=None, type=str,
                        help="Model-config key (defaults by task type: vilt-l-seq / vilt-l-mc).")
    parser.add_argument("--checkpoint_name", required=True, type=str,
                        help="Path of the upstream encoder checkpoint ('none' for base weights).")
    parser.add_argument("--pretrained_model_name", default="dandelin/vilt-b32-mlm", type=str)
    parser.add_argument("--num_shot", type=int, help="Training examples (per class for cls tasks).")
    parser.add_argument("--subsample_seed", type=int, help="Seed for few-shot sampling.")
    parser.add_argument("--climb_data_dir", type=str, default=".",
                        help="Root of language task data dirs.")
    parser.add_argument("--mean_image_path", type=str, default=None,
                        help="Path to coco_mean_image.png (gray fallback if absent).")
    parser.add_argument("--max_len_override", type=int, default=0,
                        help="Override the task config's max_len (tokens). "
                             "Values > 40 enter the reallocate_text_image "
                             "long-text regime (reference vilt.py:57-81); at "
                             ">= ~1992 the total sequence crosses S=2048 "
                             "where --attn_impl auto switches to the Pallas "
                             "flash kernels (1.45-1.76x XLA on v5e).")
    add_common_args(parser)
    add_tpu_args(parser)
    return parser


def main(argv=None):
    setup_logging()
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    set_seed(args)
    enable_compilation_cache()

    import jax
    import numpy as np

    from climb_tpu.data.image_pipeline import process_image
    from climb_tpu.data.mean_image import load_mean_image
    from climb_tpu.data.synthetic import SyntheticTextDataset
    from climb_tpu.models import ViltClassifier
    from climb_tpu.models.surgery import reallocate_text_image
    from climb_tpu.train.downstream import (
        train_downstream,
        upstream_name_from_checkpoint,
        write_downstream_results,
    )
    from climb_tpu.train.model_factory import load_encoder_params, vilt_config_from_args

    task_config = apply_task_config_overrides(
        task_configs, getattr(args, "task_config_overrides", ""))[args.task_name]
    is_mc = args.task_name in MC_TASKS
    prefix = "viltbert" if args.encoder_name == "viltbert" else "vilt"
    model_catog = args.model_catog or (f"{prefix}-l-mc" if is_mc else f"{prefix}-l-seq")
    model_config = model_configs[model_catog]
    max_len = args.max_len_override or task_config["max_len"]
    num_labels = task_config["num_labels"]

    is_viltbert = args.encoder_name == "viltbert"
    cfg = vilt_config_from_args(args, needs_three_modalities=False)
    params_enc, cfg = load_encoder_params(
        None if args.checkpoint_name in ("none", "scratch") else args.checkpoint_name,
        cfg, args.pretrained_model_name, args.seed, encoder_name=args.encoder_name,
    )

    # mean image; reallocate text/image budget for long-text tasks
    # (reference train_language.py:67-84; viltbert.py:60-85 reallocates the
    # ViLT side only — BERT has 512 position slots already)
    img_size = None
    if max_len > cfg.max_text_len:
        img_size = (128, 128)
        if is_viltbert:
            params_enc = dict(params_enc)
            params_enc["vilt"], cfg = reallocate_text_image(
                params_enc["vilt"], cfg, max_len, img_size
            )
        else:
            params_enc, cfg = reallocate_text_image(params_enc, cfg, max_len, img_size)
    mean_img = load_mean_image(args.mean_image_path, img_size)
    canvas, patch_hw = process_image(mean_img, (cfg.image_height, cfg.image_width))
    extra_batch = {
        "pixel_values": np.asarray(canvas)[None],
        "patch_hw": np.asarray(patch_hw, np.int32)[None],
    }

    model_type = "multi-choice" if is_mc else "classification"
    if is_viltbert:
        from climb_tpu.models.viltbert import ViltBertClassifier

        module = ViltBertClassifier(cfg, num_labels=num_labels, model_type=model_type)
    else:
        module = ViltClassifier(cfg, num_labels=num_labels, model_type=model_type)
    # init full classifier, graft encoder weights
    L = max_len
    if is_mc:
        init_batch = {
            "input_ids": np.zeros((2, num_labels, L), np.int32),
            "text_mask": np.ones((2, num_labels, L), np.float32),
            **{k: v for k, v in extra_batch.items()},
        }
    else:
        init_batch = {
            "input_ids": np.zeros((2, L), np.int32),
            "text_mask": np.ones((2, L), np.float32),
            **{k: v for k, v in extra_batch.items()},
        }
    variables = module.init(jax.random.PRNGKey(args.seed), init_batch)
    params = dict(variables["params"])
    trainable_mask = None
    if is_viltbert:
        from climb_tpu.models.viltbert import viltbert_frozen_mask

        params["viltbert"] = params_enc
        trainable_mask = viltbert_frozen_mask(params)
    else:
        params["vilt"] = params_enc

    if getattr(args, "synthetic", False):
        n_choices = num_labels if is_mc else None
        datasets = tuple(
            SyntheticTextDataset(
                size, num_labels, model_type, n_choices, max_len, seed=args.seed + i
            )
            for i, size in enumerate(
                [args.synthetic_train_size, max(8, args.synthetic_train_size // 4)] * 2
            )
        )[:3]
    else:
        from climb_tpu.data.language import build_language_dataset
        from climb_tpu.data.tokenization import load_tokenizer

        tok = load_tokenizer(getattr(args, "tokenizer", "bert-base-uncased"),
                             getattr(args, "vocab_path", None))
        data_dir = task_config["data_dir"]
        if data_dir and not os.path.isabs(data_dir):
            data_dir = os.path.join(args.climb_data_dir, data_dir)
        datasets = (
            build_language_dataset(args.task_name, data_dir, "train", max_len,
                                   args.num_shot, args.subsample_seed, tok),
            build_language_dataset(args.task_name, data_dir, "val", max_len, tokenizer=tok),
            build_language_dataset(args.task_name, data_dir, "test", max_len, tokenizer=tok),
        )

    loss_type = "mc_ce" if is_mc else "ce"
    best, test, best_epoch, _ = train_downstream(
        args, module, params, task_config, datasets, loss_type, cfg.compute_dtype,
        extra_batch=extra_batch, trainable_mask=trainable_mask,
    )
    upstream = upstream_name_from_checkpoint(args.checkpoint_name)
    out = write_downstream_results(
        args.num_shot, args.subsample_seed, best, test, best_epoch,
        task_config["task_name"], upstream, args.output_dir,
    )
    logger.info("Wrote %s", out)


if __name__ == "__main__":
    main()
