"""Phase II driver: vision-only low-shot transfer.

Parity: reference ``src/train/train_vision.py`` — loads an upstream encoder
checkpoint, builds ViltForImageClassification (dummy text "This is an
image."), per-task dataloaders (n-shot/class; percentage for coco-cls),
CE loss (BCEWithLogits for coco-cls), accuracy / micro-F1 eval, nested
results json.
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
from climb_tpu.configs import task_configs
from climb_tpu.utils import set_seed

logger = logging.getLogger(__name__)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--task_name", required=True, type=str,
                        choices=["imagenet", "places365", "inat2019", "coco-cls"])
    parser.add_argument("--encoder_name", required=True, type=str, choices=["vilt", "viltbert"])
    parser.add_argument("--model_catog", default="vilt-v-cls", type=str)
    parser.add_argument("--checkpoint_name", required=True, type=str,
                        help="Path of the upstream encoder checkpoint ('none' for base weights).")
    parser.add_argument("--pretrained_model_name", default="dandelin/vilt-b32-mlm", type=str)
    parser.add_argument("--num_shot", type=float,
                        help="Shots per class (or train-set ratio for coco-cls).")
    parser.add_argument("--subsample_seed", type=int)
    parser.add_argument("--climb_data_dir", type=str, default=".")
    add_common_args(parser)
    add_tpu_args(parser)
    return parser


def main(argv=None):
    setup_logging()
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    if args.tiny:
        args.image_height, args.image_width = 64, 96
    set_seed(args)
    enable_compilation_cache()

    import jax
    import numpy as np

    from climb_tpu.models import ViltClassifier
    from climb_tpu.train.downstream import (
        train_downstream,
        upstream_name_from_checkpoint,
        write_downstream_results,
    )
    from climb_tpu.train.model_factory import load_encoder_params, vilt_config_from_args

    task_config = apply_task_config_overrides(
        task_configs, getattr(args, "task_config_overrides", ""))[args.task_name]
    num_labels = task_config["num_labels"]
    if getattr(args, "synthetic", False) and args.synthetic_vision_labels:
        # same rationale as --synthetic_vqa_labels: a few hundred synthetic
        # examples cannot move a 1000-way (imagenet) head off 0.0 from random
        # init — smoke runs shrink the label space so the drivers demonstrably
        # clear their chance baselines (r04 verdict item 3)
        num_labels = args.synthetic_vision_labels
    is_multilabel = args.task_name == "coco-cls"
    # coco-cls uses a percentage; others integer shots (train_vision.py:62-63)
    n_shot = args.num_shot if is_multilabel else (int(args.num_shot) if args.num_shot else None)

    is_viltbert = args.encoder_name == "viltbert"
    cfg = vilt_config_from_args(args, needs_three_modalities=False)
    params_enc, cfg = load_encoder_params(
        None if args.checkpoint_name in ("none", "scratch") else args.checkpoint_name,
        cfg, args.pretrained_model_name, args.seed, encoder_name=args.encoder_name,
    )

    if is_viltbert:
        from climb_tpu.models.viltbert import ViltBertClassifier

        module = ViltBertClassifier(cfg, num_labels=num_labels, model_type="classification")
    else:
        module = ViltClassifier(cfg, num_labels=num_labels, model_type="classification")
    init_batch = {
        "input_ids": np.zeros((2, cfg.max_text_len), np.int32),
        "text_mask": np.ones((2, cfg.max_text_len), np.float32),
        "pixel_values": np.zeros((2, cfg.image_height, cfg.image_width, 3), np.float32),
        "patch_hw": np.ones((2, 2), np.int32),
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
        from climb_tpu.data.synthetic import SyntheticVLDataset

        canvas = (cfg.image_height, cfg.image_width)
        mk = lambda size, seed: SyntheticVLDataset(
            size, num_labels, "classification", 1, None, cfg.max_text_len, canvas,
            soft_targets=False, seed=seed,
        )
        datasets = (
            mk(args.synthetic_train_size, args.seed),
            mk(max(8, args.synthetic_train_size // 4), args.seed + 1),
            mk(max(8, args.synthetic_train_size // 4), args.seed + 2),
        )
        if is_multilabel:
            datasets = tuple(_MultiHotWrapper(d, num_labels) for d in datasets)
    else:
        from climb_tpu.data.tokenization import load_tokenizer
        from climb_tpu.data.vision import build_vision_dataset

        tok = load_tokenizer(getattr(args, "tokenizer", "bert-base-uncased"),
                             getattr(args, "vocab_path", None))
        data_dir = task_config["data_dir"]
        if data_dir and not os.path.isabs(data_dir):
            data_dir = os.path.join(args.climb_data_dir, data_dir)
        canvas = (cfg.image_height, cfg.image_width)
        datasets = (
            build_vision_dataset(args.task_name, data_dir, "train", n_shot,
                                 args.subsample_seed, tok, cfg.max_text_len, canvas),
            build_vision_dataset(args.task_name, data_dir, "val", n_shot,
                                 None, tok, cfg.max_text_len, canvas),
            build_vision_dataset(args.task_name, data_dir, "test", None,
                                 None, tok, cfg.max_text_len, canvas),
        )

    loss_type = "bce_multilabel" if is_multilabel else "ce"
    # eval batch 128 like the reference's non-train loaders (imagenet:163)
    best, test, best_epoch, _ = train_downstream(
        args, module, params, task_config, datasets, loss_type, cfg.compute_dtype,
        eval_batch_size=128, trainable_mask=trainable_mask,
    )
    upstream = upstream_name_from_checkpoint(args.checkpoint_name)
    out = write_downstream_results(
        n_shot, args.subsample_seed, best, test, best_epoch,
        task_config["task_name"], upstream, args.output_dir,
    )
    logger.info("Wrote %s", out)


class _MultiHotWrapper:
    """Synthetic int labels -> multi-hot vectors (coco-cls schema)."""

    def __init__(self, base, num_labels):
        self.base, self.num_labels = base, num_labels

    def __len__(self):
        return len(self.base)

    def __getitem__(self, i):
        import numpy as np

        ex = dict(self.base[i])
        hot = np.zeros((self.num_labels,), np.float32)
        hot[int(ex["labels"]) % self.num_labels] = 1.0
        ex["labels"] = hot
        return ex


if __name__ == "__main__":
    main()
