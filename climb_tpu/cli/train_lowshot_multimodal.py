"""Phase II driver: low-shot multimodal transfer.

Parity: reference ``src/train/train_lowshot_multimodal.py`` — same flag
surface as the Phase I driver (minus do_train/do_eval); for each upstream
task checkpoint, low-shot-train every task *after* it in the sequence
(``singletask_ft`` trains low-shot directly from the base weights); appends
``lowshot_results.json`` with the reference's record layout.
"""

import argparse
import copy
import json
import logging
import os

from climb_tpu.cli.common import (
    add_common_args,
    add_tpu_args,
    apply_task_config_overrides,
    enable_compilation_cache,
    setup_logging,
)
from climb_tpu.cli.train_upstream_continual_learning import experiment_name_for
from climb_tpu.configs import (
    ADAPTER_MAP,
    ALLOWED_CL_ENCODERS,
    SUPPORTED_VL_TASKS,
    model_configs,
    task_configs,
)
from climb_tpu.utils import set_seed

logger = logging.getLogger(__name__)


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder_name", required=True, type=str, choices=ALLOWED_CL_ENCODERS)
    parser.add_argument("--pretrained_model_name", required=True, type=str)
    parser.add_argument("--ordered_cl_tasks", type=str, required=True)
    parser.add_argument("--cl_algorithm", type=str, required=True,
                        choices=["singletask_ft", "sequential_ft", "experience_replay",
                                 "ewc", "adapter", "freeze_encoder", "freeze_bottom_k_layers"])
    parser.add_argument("--climb_data_dir", type=str, required=True)
    parser.add_argument("--memory_percentage", type=float, default=0.0)
    parser.add_argument("--memory_sampling_strategy", type=str,
                        choices=["random", "random-balanced"])
    parser.add_argument("--replay_frequency", type=int, default=100)
    parser.add_argument("--adapter_method", default="vanilla")
    parser.add_argument("--adapter_config", choices=list(ADAPTER_MAP.keys()))
    parser.add_argument("--adapter_reduction_factor", type=int, default=0)
    parser.add_argument("--lora_rank", type=int, default=0)
    parser.add_argument("--lora_alpha", type=float, default=0.0)
    parser.add_argument("--lora_targets", type=str, default="")
    parser.add_argument("--ewc_fisher_sample_percentage", type=float, default=0.0)
    parser.add_argument("--ewc_loss_weight", type=float, default=0.0)
    parser.add_argument("--layers_to_freeze", type=int, default=0)
    add_common_args(parser)
    add_tpu_args(parser)
    return parser


def lowshot_experiment_name(args) -> str:
    """Reference naming (train_lowshot_multimodal.py:117-120) — adapter runs
    are tagged with just the adapter config (no method)."""
    name = f"{args.encoder_name}-{args.cl_algorithm}"
    if args.cl_algorithm == "adapter":
        name = f"{name}_{args.adapter_config}"
    elif args.cl_algorithm == "freeze_bottom_k_layers":
        name = name.replace("_k_layers", f"{args.layers_to_freeze}layers")
    for i, task_key in enumerate(args.ordered_cl_tasks):
        name = f"{name}-task{i}_{task_key}"
    return name


def main(argv=None):
    # local shadow so a synthetic-only override can never leak across
    # in-process invocations (tests call main() repeatedly)
    task_configs = globals()["task_configs"]
    setup_logging()
    args = build_parser().parse_args(argv)
    args.ordered_cl_tasks = args.ordered_cl_tasks.split(",")
    if args.tiny:
        args.image_height, args.image_width = 64, 96
    for task_key in args.ordered_cl_tasks:
        assert task_key in SUPPORTED_VL_TASKS
    if getattr(args, "synthetic", False) and args.synthetic_vqa_labels:
        # learnable smoke configuration — MUST match the upstream CL driver's
        # override so the Phase I smoke checkpoints' small VQA head shape
        # matches here and partial_load transfers it (otherwise the head is
        # silently kept at init as a shape mismatch)
        task_configs = {
            k: dict(v, num_labels=args.synthetic_vqa_labels) if k == "vqa" else v
            for k, v in task_configs.items()
        }
    task_configs = apply_task_config_overrides(
        task_configs, getattr(args, "task_config_overrides", ""))

    output_dir = os.path.join(args.output_dir, lowshot_experiment_name(args))
    results_file = os.path.join(output_dir, "lowshot_results.json")
    os.makedirs(output_dir, exist_ok=True)
    set_seed(args)
    enable_compilation_cache()

    from climb_tpu.ckpt import partial_load, task_checkpoint_exists, load_task_checkpoint
    from climb_tpu.train import create_cl_model, get_task_trainer_class

    model_config = model_configs[args.encoder_name]
    model = create_cl_model(args, task_configs)

    results = []
    if os.path.exists(results_file):
        with open(results_file) as f:
            results = json.load(f)

    def train_low_shot(low_shot_model, low_shot_task_key):
        low_shot_config = task_configs[low_shot_task_key]["low_shot_config"]
        trainer_cls = get_task_trainer_class(low_shot_config["trainer"])
        trainer = trainer_cls(args, task_configs, model_config)
        best_score, _ = trainer.train(low_shot_model)
        cfg_copy = {k: v for k, v in low_shot_config.items() if k != "trainer"}
        return best_score, cfg_copy

    if args.cl_algorithm == "singletask_ft":
        task_key = args.ordered_cl_tasks[0]
        score, cfg_copy = train_low_shot(copy.copy(model), task_key)
        results.append({
            "task_key": task_key,
            "best_low_shot_score": score,
            "low_shot_config": cfg_copy,
        })
        with open(results_file, "w") as f:
            json.dump(results, f)
    else:
        for task_num, task_key in enumerate(args.ordered_cl_tasks):
            assert task_checkpoint_exists(output_dir, task_num, task_key), (
                f"missing upstream checkpoint for task{task_num}_{task_key}"
            )
            ckpt = load_task_checkpoint(output_dir, task_num, task_key)
            merged, _, _ = partial_load(model.params, ckpt)
            model = model.with_params(merged)
            low_shot_tasks = args.ordered_cl_tasks[task_num + 1 :]
            logger.info("Low-shot transfer from %s to %s", task_key, ",".join(low_shot_tasks))
            for low_shot_task_key in low_shot_tasks:
                score, cfg_copy = train_low_shot(copy.copy(model), low_shot_task_key)
                results.append({
                    "upstream_task_num": task_num,
                    "upstream_task_key": task_key,
                    "lowshot_task_num": args.ordered_cl_tasks.index(low_shot_task_key),
                    "lowshot_task_key": low_shot_task_key,
                    "best_low_shot_score": score,
                    "low_shot_config": cfg_copy,
                })
                with open(results_file, "w") as f:
                    json.dump(results, f)


if __name__ == "__main__":
    main()
