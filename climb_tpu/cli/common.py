"""Shared CLI plumbing: the reference's flag surface + TPU-specific flags."""

import argparse
import logging


def setup_logging():
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        datefmt="%H:%M:%S",
    )


def enable_compilation_cache(cache_dir: str = None):
    """Persistent XLA compilation cache — TPU processes only.

    The fully-unrolled train step takes ~3 min to compile through the TPU
    tunnel; caching makes reruns and resumed experiments instant.

    CPU processes get NO persistent cache. XLA:CPU entries are ahead-of-time
    compiled MACHINE CODE, and a stale entry aborts the process inside pxla
    ``__call__`` with no diagnostic when the executing CPU no longer matches
    the compiling one. Two rounds of namespacing failed to contain this:
    hashing /proc/cpuinfo flags was defeated by dev-VM reassignments that
    keep the flags identical, and adding the boot id was defeated by
    entries that went stale WITHIN one boot (cloud VMs can migrate across
    physical hosts mid-boot). CPU compiles here are tiny-model cheap
    (seconds; the in-process jit cache still dedupes within a run), so the
    robust call is to not persist them at all."""
    import os

    import jax

    env_plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    on_cpu = (
        env_plat == "cpu"
        or getattr(jax.config, "jax_platforms", None) == "cpu"
        # no platform forced AND no axon TPU tunnel registered: jax
        # auto-resolves to the CPU backend, so this process's AOT artifacts
        # would be CPU machine code too
        or (not env_plat and not os.environ.get("PALLAS_AXON_POOL_IPS"))
    )
    try:
        if on_cpu:
            jax.config.update("jax_compilation_cache_dir", None)
            return
        cache_dir = cache_dir or os.path.expanduser("~/.cache/climb_tpu_xla")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # older jax without the knobs
        pass


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument("--output_dir", type=str, required=True,
                        help="Directory where experiment results and checkpoints are saved.")
    parser.add_argument("--do_wandb_logging", action="store_true",
                        help="Log experiments in W&B.")
    parser.add_argument("--batch_size", type=int, default=32, help="Batch size.")
    parser.add_argument("--num_workers", type=int, default=2,
                        help="Number of host loader workers.")
    parser.add_argument("--seed", type=int, default=42, help="Random seed.")


def add_tpu_args(parser: argparse.ArgumentParser):
    """TPU-native extensions (not in the reference's flag surface)."""
    parser.add_argument("--compute_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="Compute dtype for the encoder.")
    parser.add_argument("--attn_impl", type=str, default="auto",
                        choices=["xla", "xla_ckpt", "pallas", "fused_block",
                                 "auto"],
                        help="Attention kernel implementation. The default "
                             "'auto' picks XLA below S=2048 and the Pallas "
                             "long-sequence flash kernels at S>=2048 (1.47-"
                             "1.76x XLA on v5e microbench; the end-to-end "
                             "language-driver A/B at S=1057 measured XLA "
                             "1.65x pallas under remat, LONGSEQ_r05.json, "
                             "so the production crossover sits higher than "
                             "the kernel microbench's S~1024); "
                             "'fused_block' is the whole-sublayer Pallas "
                             "kernel — measured 10% slower than XLA at ViLT "
                             "shapes, see docs/PERF.md.")
    parser.add_argument("--mlp_impl", type=str, default="xla",
                        choices=["xla", "pallas"],
                        help="MLP kernel implementation (pallas = fused "
                             "Dense->GELU->Dense).")
    parser.add_argument("--dense_impl", type=str, default="xla",
                        choices=["xla", "int8", "int8_static"],
                        help="Dense-layer implementation for DETERMINISTIC "
                             "forwards only (eval/predict): 'int8' runs the "
                             "encoder GEMMs on the int8 MXU path (2x peak "
                             "bf16 on v5e) with per-channel weight + dynamic "
                             "per-row activation scales; 'int8_static' uses "
                             "PTQ-calibrated per-tensor activation scales "
                             "(fully fusable — the fast serving mode; "
                             "predict calibrates automatically, see "
                             "--quant_calibration_batches). Training steps "
                             "always use 'xla'; an int8_static forward with "
                             "no calibration available (e.g. the per-epoch "
                             "eval inside a training run) falls back to "
                             "dynamic 'int8'.")
    parser.add_argument("--remat", action="store_true",
                        help="Rematerialize encoder blocks (trade FLOPs for HBM).")
    parser.add_argument("--remat_policy", type=str, default="full",
                        choices=["full", "dots", "selective"],
                        help="What remat recomputes in backward.")
    parser.add_argument("--grad_accum_steps", default=1,
                        type=lambda s: s if s in ("auto", "sweep") else int(s),
                        help="Split each batch into k microbatches and average "
                             "gradients inside one step (memory vs throughput); "
                             "'auto' picks k per batch shape from the v5e-"
                             "measured token-budget heuristic (recommended "
                             "with bucketing — the optimum shifts with "
                             "sequence length); 'sweep' MEASURES k on-device "
                             "once per shape and caches per device kind "
                             "(~/.cache/climb_tpu_accum.json) — use on chip "
                             "generations other than v5e.")
    parser.add_argument("--auto_accum_token_budget", type=int, default=None,
                        help="Override the 'auto' policy's encoder-tokens-"
                             "per-microbatch budget (default 8000, measured "
                             "on v5e — re-measure with exp_scripts/"
                             "bench_accum_width.py, recipe in docs/PERF.md).")
    parser.add_argument("--scan_unroll", type=int, default=1,
                        help="Unroll factor for the encoder layer scan; full "
                             "unroll (=num_layers) trades compile time for "
                             "~25%% step-time reduction on TPU.")
    parser.add_argument("--fuse_qkv", action="store_true",
                        help="Compute Q/K/V with one (D,3D) GEMM per block "
                             "(checkpoint layout unchanged).")
    parser.add_argument("--save_state_epochs", type=int, default=1,
                        help="Every N epochs, checkpoint the FULL train state "
                             "(params + optimizer moments + rng) for mid-task "
                             "elastic resume; 0 disables (the reference can "
                             "only resume at task granularity).")
    parser.add_argument("--eval_batch_size", type=int, default=None,
                        help="Eval batch size (global, before per-task fold "
                             "divisors); defaults to --batch_size. Measured "
                             "on v5e the forward peaks at 64 (1525 ex/s; 128 "
                             "and 256 are slower) — use this to go SMALLER "
                             "on memory-tight configs.")
    parser.add_argument("--no_sigterm_checkpoint", action="store_true",
                        help="Disable graceful preemption (by default, when "
                             "elastic checkpointing is on, SIGTERM saves the "
                             "full train state incl. loader position and "
                             "exits 143 for a bit-identical mid-epoch resume).")
    parser.add_argument("--worker_mode", type=str, default="thread",
                        choices=["thread", "process"],
                        help="Host loader workers: threads (native decode "
                             "releases the GIL) or fork()ed processes (for "
                             "GIL-bound pipelines).")
    parser.add_argument("--n_model", type=int, default=1,
                        help="Tensor-parallel width of the device mesh (data axis gets the rest).")
    parser.add_argument("--use_mesh", action="store_true",
                        help="Shard over all visible devices (DP x TP mesh).")
    parser.add_argument("--pp_stages", type=int, default=0,
                        help="Pipeline-parallel stages: shard the encoder's "
                             "stacked layer axis over a 'pipe' mesh axis and "
                             "stream microbatches through the GPipe schedule "
                             "(remaining device factor = data parallelism). "
                             "Composes with DP only (not --fsdp/--n_model); "
                             "num_layers must divide by stages*virtual. "
                             "Trajectory matches plain DP "
                             "(tests/test_pp_training.py).")
    parser.add_argument("--pp_microbatches", type=int, default=0,
                        help="Microbatches per pipeline schedule (0 = one "
                             "per stage). More microbatches shrink the "
                             "fill/drain bubble: (P-1)/(M+P-1) of ticks.")
    parser.add_argument("--pp_virtual", type=int, default=1,
                        help="Virtual stages per device (circular/"
                             "interleaved schedule): V>1 shrinks the bubble "
                             "V-fold at one extra stacked-param gather per "
                             "step (stored layout stays canonical).")
    parser.add_argument("--fsdp", action="store_true",
                        help="Fully-sharded data parallelism (ZeRO-3): also "
                             "shard parameters and AdamW moments over the "
                             "'data' mesh axis; GSPMD all-gathers weights "
                             "just-in-time and reduce-scatters gradients. "
                             "Identical trajectory to plain DP (tested); "
                             "param+optimizer memory / data-axis size.")
    parser.add_argument("--image_height", type=int, default=384)
    parser.add_argument("--image_width", type=int, default=640)
    parser.add_argument("--aspect_buckets", type=str, default=None,
                        help="Comma-separated canvas-width buckets (pixels, "
                             "e.g. '384,512,640') for loader-side aspect "
                             "bucketing: each batch holds only images whose "
                             "resized width fits one bucket and runs on a "
                             "canvas cropped to it. 4:3 photos (the COCO/"
                             "Flickr majority) then train at 384x512 — "
                             "measured 1.21x the fixed 640 canvas on v5e "
                             "(docs/PERF.md). One extra jit specialization "
                             "per bucket; results are unchanged (padding "
                             "patches are masked either way).")
    parser.add_argument("--text_buckets", type=str, default=None,
                        help="Comma-separated text-length buckets (tokens, "
                             "e.g. '16,24,40') or 'auto': the sequence-axis "
                             "analog of --aspect_buckets. Each batch holds "
                             "only examples whose real token count fits one "
                             "bucket and its text arrays are sliced to it — "
                             "typical VQA/SNLI-VE texts (10-15 tokens) stop "
                             "paying attention+MLP FLOPs for the 40-token "
                             "pad. Composes with --aspect_buckets; results "
                             "are unchanged (padding tokens are masked "
                             "either way).")
    parser.add_argument("--adam_moments_dtype", type=str, default=None,
                        choices=["bfloat16"],
                        help="Store AdamW's first moment in bf16 (25% less "
                             "optimizer HBM; accumulation stays f32). The "
                             "second moment keeps f32 for dynamic range.")
    parser.add_argument("--skip_nonfinite_updates", type=int, default=0,
                        help="If > 0, a train step whose gradients contain "
                             "NaN/inf is skipped (params + AdamW moments "
                             "untouched) instead of poisoning the run; "
                             "after N consecutive bad steps the update "
                             "applies anyway so persistent failures "
                             "surface. Finite trajectories match unguarded.")
    parser.add_argument("--sharded_checkpoints", action="store_true",
                        help="Write task checkpoints as sharded directories "
                             "(each process stores only its addressable "
                             "unique array shards) instead of host-gathered "
                             "msgpack files — the FSDP/multi-host-native "
                             "save path; restore reshards onto any mesh. "
                             "All readers auto-detect the layout.")
    parser.add_argument("--async_checkpoint", action="store_true",
                        help="Overlap elastic-checkpoint serialization + "
                             "disk I/O with training on a background writer "
                             "thread (device->host snapshot stays "
                             "synchronous; writes are tmp+rename atomic). "
                             "Use with --save_state_epochs.")
    parser.add_argument("--max_text_len", type=int, default=40)
    parser.add_argument("--tokenizer", type=str, default="bert-base-uncased",
                        help="Tokenizer spec for real (non---synthetic) data: "
                             "an HF name (needs a local HF cache — this is "
                             "also a vocab-file path fallback) or 'synthetic'.")
    parser.add_argument("--vocab_path", type=str, default=None,
                        help="Explicit WordPiece vocab.txt path — takes "
                             "precedence over --tokenizer; served by the "
                             "native C++ tokenizer when built.")
    # Hermetic/testing extensions
    parser.add_argument("--synthetic", action="store_true",
                        help="Use synthetic in-memory datasets (no real data needed).")
    parser.add_argument("--synthetic_train_size", type=int, default=64)
    parser.add_argument("--synthetic_vqa_labels", type=int, default=0,
                        help="With --synthetic, shrink the VQA label space to "
                             "this many answers (0 = keep the real 3,129). "
                             "512 synthetic examples cannot move a 3,129-way "
                             "head off 0.0, so smoke runs use a learnable "
                             "size to exercise the soft-score metric "
                             "end-to-end.")
    parser.add_argument("--task_config_overrides", type=str, default="",
                        help="Comma list of task.key=value hyperparameter "
                             "overrides applied to the in-memory task "
                             "configs, e.g. 'vqa.lr=4e-4,vqa.num_epochs=20'. "
                             "Smoke runs use this to rescale per-task "
                             "optimization to the synthetic step budget "
                             "(values are parsed as int/float when they look "
                             "like one).")
    parser.add_argument("--synthetic_vision_labels", type=int, default=0,
                        help="With --synthetic, shrink a vision task's label "
                             "space to this many classes (0 = keep the real "
                             "count) so smoke-scale runs can clear their "
                             "chance baselines — the vision analog of "
                             "--synthetic_vqa_labels.")
    parser.add_argument("--synthetic_noise", type=float, default=0.0,
                        help="With --synthetic, fraction of examples whose "
                             "learnable signal encodes a random WRONG class "
                             "(targets stay true). Bayes-optimal dev score "
                             "becomes 1-p instead of 100, so smoke-run "
                             "forgetting/transfer matrices are non-degenerate "
                             "and CL algorithms separate.")
    parser.add_argument("--tiny", action="store_true",
                        help="Tiny model config (fast CI / smoke runs).")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="Capture a jax.profiler trace of train steps 5-10 "
                             "into this directory (view with TensorBoard/xprof).")
    parser.add_argument("--memory_profile", type=str, default=None,
                        help="Write a device-memory profile (pprof format) "
                             "to this path after train step 5 — what is "
                             "live in HBM at steady state (params, moments, "
                             "remat'd activations). View with pprof.")
    parser.add_argument("--eval_every_epoch", action="store_true",
                        help="Eval every epoch instead of the reference's "
                             "epoch>5-and-even gate (useful for short runs).")


def apply_task_config_overrides(task_configs: dict, spec: str) -> dict:
    """Apply a ``--task_config_overrides`` spec ('task.key=value,...') to a
    COPY of the task-config registry; numeric-looking values parse to
    int/float. Unknown task keys raise (typos must not silently no-op)."""
    if not spec:
        return task_configs
    out = {k: dict(v) for k, v in task_configs.items()}
    for item in spec.split(","):
        path, _, raw = item.partition("=")
        task, _, key = path.strip().partition(".")
        if task not in out or not key or not raw:
            raise ValueError(f"bad --task_config_overrides item {item!r} "
                             f"(expected task.key=value with a known task)")
        if key not in out[task]:
            raise ValueError(
                f"--task_config_overrides: {task!r} has no hyperparameter "
                f"{key!r} (known: {sorted(out[task])}) — a typo here would "
                f"silently run at default values")
        try:
            val = int(raw)
        except ValueError:
            try:
                val = float(raw)
            except ValueError:
                val = raw
        out[task][key] = val
    return out
