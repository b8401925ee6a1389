"""Phase I driver: upstream continual learning over a VL task sequence.

Parity: reference ``src/train/train_upstream_continual_learning.py`` — same
required flags, experiment-directory naming (:110-117), algorithm-argument
validation (:125-138), per-task train -> checkpoint -> results.json loop with
resume-and-skip (:216-294), ER buffer / EWC Fisher post-task hooks, and the
transfer/forgetting evaluation phase writing eval_results.json (:296-327).

Usage (synthetic smoke run):
  python -m climb_tpu.cli.train_upstream_continual_learning \\
    --encoder_name vilt --pretrained_model_name scratch \\
    --ordered_cl_tasks snli-ve --cl_algorithm singletask_ft \\
    --climb_data_dir /tmp/x --synthetic --tiny \\
    --output_dir /tmp/out --batch_size 8 --do_train --do_eval
"""

import argparse
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
from climb_tpu.configs import (
    ADAPTER_MAP,
    ALLOWED_CL_ENCODERS,
    SUPPORTED_VL_TASKS,
    task_configs,
    model_configs,
    wandb_config,
)
from climb_tpu.utils import set_seed, wandb_logger

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--encoder_name", default=None, type=str, required=True,
                        choices=ALLOWED_CL_ENCODERS,
                        help="The name of the base pretrained encoder.")
    parser.add_argument("--pretrained_model_name", default=None, type=str, required=True,
                        help="Name of pretrained model weights to load ('scratch' to skip).")
    parser.add_argument("--ordered_cl_tasks", type=str, required=True,
                        help="Ordered list of VL task keys, comma-separated.")
    parser.add_argument("--cl_algorithm", type=str, required=True,
                        choices=["singletask_ft", "sequential_ft", "experience_replay",
                                 "ewc", "adapter", "freeze_encoder", "freeze_bottom_k_layers",
                                 "feature_distill"],
                        help="Continual Learning algorithm (feature_distill "
                             "is beyond-reference: cl/distill.py).")
    parser.add_argument("--climb_data_dir", type=str, required=True,
                        help="Directory where all the CLiMB data is stored.")
    parser.add_argument("--do_train", action="store_true")
    parser.add_argument("--do_eval", action="store_true")
    parser.add_argument("--visual_input_type", default=None,
                        choices=["pil-image", "raw"],
                        help="Override the model config's image input layout: "
                             "'pil-image' = uint8 canvas normalized on-device "
                             "(default, fastest), 'raw' = host-normalized f32 "
                             "(the reference raw path's normalize-at-load "
                             "semantics on this repo's padded canvas — "
                             "bit-identical to 'pil-image' inputs; see "
                             "docs/MIGRATION.md).")

    # experience replay
    parser.add_argument("--memory_percentage", type=float, default=0.0,
                        help="Percentage of tasks' training samples saved into memory.")
    parser.add_argument("--memory_sampling_strategy", type=str,
                        choices=["random", "random-balanced"],
                        help="Strategy for sampling memory buffer samples.")
    parser.add_argument("--replay_frequency", type=int, default=100,
                        help="Training steps between memory replay steps.")
    # adapters
    parser.add_argument("--adapter_method", choices=["vanilla"], help="Adapter algorithm.")
    parser.add_argument("--adapter_config", choices=list(ADAPTER_MAP.keys()),
                        help="Adapter architecture.")
    parser.add_argument("--adapter_reduction_factor", type=int, default=0,
                        help="Downsampling ratio for adapter layers.")
    parser.add_argument("--lora_rank", type=int, default=0,
                        help="LoRA rank override (adapter_config=lora).")
    parser.add_argument("--lora_alpha", type=float, default=0.0,
                        help="LoRA alpha override (scale = alpha / rank).")
    parser.add_argument("--lora_targets", type=str, default="",
                        help="Comma-separated projection targets for LoRA "
                             "(subset of q,k,v,attn_out,fc1,fc2).")
    # ewc
    parser.add_argument("--ewc_fisher_sample_percentage", type=float, default=0.0,
                        help="Percentage of training samples for the Fisher matrix per task.")
    parser.add_argument("--ewc_loss_weight", type=float, default=0.0,
                        help="Scaling of the EWC loss.")
    parser.add_argument("--ewc_offload_to_host", action="store_true",
                        help="Keep EWC Fisher/snapshots in host RAM instead of HBM.")
    # feature distillation (beyond reference)
    parser.add_argument("--distill_loss_weight", type=float, default=1.0,
                        help="Scaling of the feature-distillation penalty "
                             "(cl_algorithm=feature_distill).")
    parser.add_argument("--distill_offload_to_host", action="store_true",
                        help="Keep the distillation teacher in host RAM "
                             "instead of HBM.")
    # freeze bottom-k
    parser.add_argument("--layers_to_freeze", type=int, default=0,
                        help="Number of bottom layers to freeze.")

    add_common_args(parser)
    add_tpu_args(parser)
    return parser


def _dump_json_atomic(obj, path: str):
    """tmp + os.replace so a signal mid-write can never leave a truncated
    results/eval_results JSON behind (the rerun's resume logic parses it)."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


def experiment_name_for(args) -> str:
    name = f"{args.encoder_name}-{args.cl_algorithm}"
    if args.cl_algorithm == "adapter":
        name = f"{name}_{args.adapter_method}_{args.adapter_config}config"
    elif args.cl_algorithm == "freeze_bottom_k_layers":
        name = name.replace("_k_layers", f"{args.layers_to_freeze}layers")
    for i, task_key in enumerate(args.ordered_cl_tasks):
        name = f"{name}-task{i}_{task_key}"
    return name


def validate_algorithm_args(args):
    if args.cl_algorithm == "singletask_ft":
        assert len(args.ordered_cl_tasks) == 1
    else:
        assert len(args.ordered_cl_tasks) > 1
    if args.cl_algorithm == "experience_replay":
        assert args.memory_percentage > 0.0
        assert args.replay_frequency > 0
    if args.cl_algorithm == "adapter" and args.adapter_config != "lora":
        assert args.adapter_reduction_factor > 0
    if args.cl_algorithm == "ewc":
        assert args.ewc_fisher_sample_percentage > 0
        assert args.ewc_loss_weight > 0.0
    if args.cl_algorithm == "feature_distill":
        assert args.distill_loss_weight > 0.0
    if args.cl_algorithm == "freeze_bottom_k_layers":
        assert args.layers_to_freeze > 0
    for task_key in args.ordered_cl_tasks:
        assert task_key in SUPPORTED_VL_TASKS, f"unsupported task {task_key}"


def main(argv=None):
    # local shadow so a synthetic-only override can never leak across
    # in-process invocations (tests call main() repeatedly)
    task_configs = globals()["task_configs"]
    setup_logging()
    args = build_parser().parse_args(argv)
    args.ordered_cl_tasks = args.ordered_cl_tasks.split(",")
    if args.tiny:  # tiny model config implies the tiny image canvas
        args.image_height, args.image_width = 64, 96
    if getattr(args, "synthetic", False) and args.synthetic_vqa_labels:
        # learnable smoke configuration: a small answer space the synthetic
        # set can actually fit (head shape changes, so this is synthetic-only)
        task_configs = {
            k: dict(v, num_labels=args.synthetic_vqa_labels) if k == "vqa" else v
            for k, v in task_configs.items()
        }
    task_configs = apply_task_config_overrides(
        task_configs, getattr(args, "task_config_overrides", ""))

    experiment_name = experiment_name_for(args)
    output_dir = os.path.join(args.output_dir, experiment_name)
    results_file = os.path.join(output_dir, "results.json")
    os.makedirs(output_dir, exist_ok=True)
    set_seed(args)
    enable_compilation_cache()
    validate_algorithm_args(args)

    # deferred heavy imports (jax) until after arg validation
    import jax

    from climb_tpu.cl import (
        EWC,
        AdapterHandler,
        ExperienceReplayMemory,
        FeatureDistill,
        freeze_bottom_k_layers_mask,
        freeze_encoder_mask,
    )
    from climb_tpu.parallel.mesh import make_mesh
    from climb_tpu.train import create_cl_model

    model_config = model_configs[args.encoder_name]
    if args.visual_input_type is None:
        args.visual_input_type = model_config["visual_input_type"]

    mesh = None
    if args.use_mesh and len(jax.devices()) > 1:
        mesh = make_mesh(n_model=args.n_model)
        logger.info("Mesh: %s", mesh)

    # ---- algorithm-specific initialization ----
    replay_memory = None
    ewc = None
    adapter_handler = None
    distill = None
    if args.cl_algorithm == "experience_replay":
        replay_memory = ExperienceReplayMemory()
    elif args.cl_algorithm == "adapter":
        adapter_handler = AdapterHandler(adapter_method=args.adapter_method, args=args)
    elif args.cl_algorithm == "ewc":
        ewc = EWC(args)
    elif args.cl_algorithm == "feature_distill":
        distill = FeatureDistill(args)

    model = create_cl_model(args, task_configs, adapter_handler=adapter_handler, mesh=mesh)

    if args.cl_algorithm == "freeze_encoder":
        model.trainable_mask = freeze_encoder_mask(model.params)
    elif args.cl_algorithm == "freeze_bottom_k_layers":
        model.trainable_mask = freeze_bottom_k_layers_mask(
            model.params, k=args.layers_to_freeze, num_layers=model.cfg.num_layers
        )
    if replay_memory is not None:
        replay_memory.set_model(model)

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(model.params))
    logger.info("Continual learner: %s | %d task heads (%s) | %.2fM params | algorithm=%s",
                args.encoder_name, len(args.ordered_cl_tasks),
                ",".join(args.ordered_cl_tasks), n_params / 1e6, args.cl_algorithm)

    # Driver-scope preemption protection: the trainer installs its own nested
    # handler around each train loop, but the between-task wrap-up (checkpoint
    # save, results.json write, replay-buffer build, Fisher estimation) and
    # the final eval phase must not die mid-write on SIGTERM either — the
    # handler stays installed for the whole multi-task run and the task
    # boundary polls the flag.
    from climb_tpu.utils.preemption import (
        clear_preemption,
        install_preemption_handler,
        preemption_requested,
        uninstall_preemption_handler,
    )

    driver_preempt = (
        not getattr(args, "no_sigterm_checkpoint", False)
        and install_preemption_handler()
    )
    try:
        _run(args, task_configs, model_config, experiment_name, output_dir,
             results_file, mesh, model, replay_memory, ewc, adapter_handler,
             distill, preemption_requested, clear_preemption)
    finally:
        if driver_preempt:
            uninstall_preemption_handler()


def _run(args, task_configs, model_config, experiment_name, output_dir,
         results_file, mesh, model, replay_memory, ewc, adapter_handler,
         distill, preemption_requested, clear_preemption):
    import jax

    from climb_tpu.ckpt import (
        load_task_checkpoint,
        partial_load,
        save_task_checkpoint,
        task_checkpoint_exists,
        task_dir,
    )
    from climb_tpu.evaluation import (
        catastrophic_forgetting_eval,
        upstream_knowledge_transfer_eval,
    )
    from climb_tpu.train import get_task_trainer_class

    task_trainers = {}
    if args.do_train:
        if args.do_wandb_logging:
            wandb_logger.initialize(wandb_config, experiment_name)

        results = []
        if os.path.exists(results_file):
            with open(results_file) as f:
                results = json.load(f)
            for i, r in enumerate(results):
                logger.info("Cached result — task #%d %s: best score %.2f",
                            i + 1, r["task_key"], r["best_score"])

        for task_num, task_key in enumerate(args.ordered_cl_tasks):
            task_name = task_configs[task_key]["task_name"]
            trainer_cls = get_task_trainer_class(task_configs[task_key]["trainer"])
            # enable mid-task elastic resume (epoch-granular full-state
            # checkpoints into the task's checkpoint dir)
            args.task_ckpt_dir = task_dir(output_dir, task_num, task_key)
            task_trainer = trainer_cls(args, task_configs, model_config)

            ckpt = None
            if task_checkpoint_exists(output_dir, task_num, task_key):
                try:
                    ckpt = load_task_checkpoint(output_dir, task_num, task_key)
                except Exception as e:
                    logger.warning(
                        "Checkpoint for task %s exists but is unreadable (%s); retraining",
                        task_name, e,
                    )
            if ckpt is not None:
                # resume: load checkpoint and move to the next task, with the
                # reference's partial-load fallback (:222-240)
                logger.info("Found checkpoint for task %s — loading and skipping", task_name)
                merged, loaded, missing = partial_load(model.params, ckpt)
                model = model.with_params(merged)
                if missing:
                    save_task_checkpoint(
                        output_dir, task_num, task_key, merged,
                        encoder_key=model.encoder_key,
                        sharded=getattr(args, "sharded_checkpoints", False),
                    )
            else:
                if args.cl_algorithm == "adapter":
                    logger.info("Activating adapters for task %s", task_name)
                    model = adapter_handler.activate_adapter_for_training(task_key, model)
                logger.info("Training on task #%d: %s", task_num + 1, task_name)
                best_eval_score, model = task_trainer.train(
                    model, replay_memory=replay_memory, ewc=ewc, distill=distill
                )
                logger.info("Best %s score = %.2f (epoch %d)",
                            task_name, best_eval_score, task_trainer.best_epoch)
                save_task_checkpoint(
                    output_dir, task_num, task_key, model.params,
                    encoder_key=model.encoder_key,
                    sharded=getattr(args, "sharded_checkpoints", False),
                )
                results.append({
                    "task_num": task_num,
                    "task_key": task_key,
                    "best_score": best_eval_score,
                    "best_epoch": task_trainer.best_epoch,
                })
                _dump_json_atomic(results, results_file)

            task_trainers[task_key] = task_trainer
            if args.cl_algorithm == "experience_replay":
                replay_memory.set_model(model)
                replay_memory.add_task_memory_buffer(
                    args=args, task_key=task_key, task_config=task_configs[task_key],
                    task_trainer=task_trainer,
                    memory_percentage=args.memory_percentage,
                    sampling_strategy=args.memory_sampling_strategy,
                )
            elif args.cl_algorithm == "ewc" and task_num < len(args.ordered_cl_tasks) - 1:
                ewc.save_task_parameters(
                    task_key=task_key, model=model, task_trainer=task_trainer,
                    rng=jax.random.PRNGKey(args.seed + task_num),
                )
            elif (args.cl_algorithm == "feature_distill"
                  and task_num < len(args.ordered_cl_tasks) - 1):
                distill.save_teacher(task_key, model.params)

            # a SIGTERM that landed after the train loop's last poll (e.g.
            # during end-of-task eval or checkpointing) is still pending on
            # the driver-scope handler; honor it here — the task boundary is
            # the ideal resume point (completed tasks are skipped, algorithm
            # state above is rebuilt on rerun)
            if preemption_requested():
                logger.warning(
                    "Preemption requested during task %s wrap-up; exiting 143 "
                    "at the task boundary (rerun skips completed tasks)",
                    task_name,
                )
                # acted-on exit clears the flag (same convention as the
                # trainer's in-loop exit) so a later in-process invocation
                # never phantom-preempts
                clear_preemption()
                raise SystemExit(143)

    if args.do_eval:
        logger.info("Evaluating upstream knowledge transfer...")
        upstream_dict = upstream_knowledge_transfer_eval(args, results_file)
        gains = [v["relative_gain"] for v in upstream_dict.values() if v["relative_gain"] is not None]
        if gains:
            logger.info("Average forward transfer gain = %.2f%%", sum(gains) / len(gains))

        if not task_trainers:
            for task_key in args.ordered_cl_tasks:
                trainer_cls = get_task_trainer_class(task_configs[task_key]["trainer"])
                task_trainers[task_key] = trainer_cls(args, task_configs, model_config)

        logger.info("Evaluating catastrophic forgetting...")
        forgetting_dict = catastrophic_forgetting_eval(
            args, results_file, model, task_trainers, adapter_handler
        )
        eval_results_file = os.path.join(output_dir, "eval_results.json")
        _dump_json_atomic({
            "upstream_knowledge_transfer": upstream_dict,
            "forgetting": forgetting_dict,
        }, eval_results_file)
        logger.info("Wrote %s", eval_results_file)


if __name__ == "__main__":
    main()
