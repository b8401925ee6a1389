"""Phase II drivers executed end-to-end on the real TPU chip.

CL_RUN_r03.json proves the Phase I call stack on hardware; this script does
the same for the three Phase II entry points (reference
``src/train/train_lowshot_multimodal.py`` / ``train_language.py`` /
``train_vision.py``, SURVEY.md sections 3.3-3.5):

  1. low-shot multimodal transfer over the Phase I sequential_ft task
     checkpoints (all 6 upstream->downstream pairs of the 4-task sequence),
  2. language-only transfer: one sequence task (SST-2) and one
     multiple-choice task (PIQA) through ViltClassifier + mean-image
     broadcast,
  3. vision-only transfer: one CE task (ImageNet) and the coco-cls
     BCE/micro-F1 path.

Data is synthetic (zero-egress environment) but the models are full-size
ViLT-B/32 on the production step config. Per-task ex/s is host-bound on this
1-core VM (CLAUDE.md) — the device-step headline lives in bench.py.

Writes PHASE2_RUN_r03.json at the repo root.

Usage (real TPU; low-shot reuses the Phase I checkpoints, so run
exp_scripts/run_cl_smoke_tpu.py first — or pass --skip lowshot):
  python exp_scripts/run_phase2_smoke_tpu.py [--tiny-cpu]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_DIR = os.path.expanduser("~/.cache/climb_tpu_xla")

TASKS = "vqa,nlvr2,snli-ve,vcr"
STEP_FLAGS = [
    "--compute_dtype", "bfloat16",
    "--remat", "--remat_policy", "selective",
    "--scan_unroll", "12",
    "--grad_accum_steps", "auto",
]

RE_EXS = re.compile(r"\(([\d.]+) ex/s\)")


def cache_file_count() -> int:
    if not os.path.isdir(CACHE_DIR):
        return 0
    return sum(len(fs) for _, _, fs in os.walk(CACHE_DIR))


def run_driver(name: str, argv: list, log_path: str, env: dict) -> dict:
    cache_before = cache_file_count()
    t0 = time.time()
    with open(log_path, "w") as logf:
        rc = subprocess.run(argv, env=env, cwd=REPO,
                            stdout=logf, stderr=subprocess.STDOUT).returncode
    wall = time.time() - t0
    samples = []
    with open(log_path, errors="replace") as f:
        for line in f:
            m = RE_EXS.search(line)
            if m:
                samples.append(float(m.group(1)))
    return {
        "driver": name,
        "returncode": rc,
        "wall_clock_s": round(wall, 1),
        "compile_cache_files_added": cache_file_count() - cache_before,
        "train_ex_per_s_samples": samples[-8:],
        "log": os.path.relpath(log_path, REPO),
    }


def collect_results(record: dict, out_dir: str, patterns: tuple) -> None:
    for root, _, files in os.walk(out_dir):
        for fn in files:
            if fn.endswith("_results.json") or fn in patterns:
                with open(os.path.join(root, fn)) as f:
                    record.setdefault("results", {})[fn] = json.load(f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="artifact path (default: PHASE2_RUN_r05.json at the "
                         "repo root; a --tiny-cpu rehearsal defaults to /tmp "
                         "so it can never clobber the committed TPU artifact)")
    ap.add_argument("--phase1-out",
                    default="/tmp/climb_cl_smoke_tpu_r05/sequential_ft",
                    help="Phase I output root whose sequential_ft task "
                         "checkpoints seed the low-shot transfer")
    ap.add_argument("--base-out", default=None)
    ap.add_argument("--tiny-cpu", action="store_true",
                    help="rehearse the identical flow on the CPU mesh")
    ap.add_argument("--skip", default="", help="comma list: lowshot,language,vision")
    ap.add_argument("--vision-tasks", default="imagenet:16,coco-cls:25",
                    help="comma list of vision task:num_shot pairs (coco-cls "
                         "shot is a train-set PERCENTAGE; 25%% of the smoke "
                         "set = 64 examples — 10%% = 25 examples cannot move "
                         "a 16-way multi-hot head off micro-F1 0)")
    ap.add_argument("--task-config-overrides", default="",
                    help="forwarded to the language/vision drivers (e.g. "
                         "'coco-cls.num_epochs=40' for the smoke step budget)")
    ap.add_argument("--synthetic-train-size", type=int, default=256)
    flags = ap.parse_args()
    skip = set(filter(None, flags.skip.split(",")))
    if flags.base_out is None:
        flags.base_out = ("/tmp/climb_phase2_smoke_cpu_r05" if flags.tiny_cpu
                          else "/tmp/climb_phase2_smoke_tpu_r05")
    if flags.out is None:
        flags.out = ("/tmp/climb_phase2_smoke_cpu_r05/PHASE2_rehearsal.json"
                     if flags.tiny_cpu
                     else os.path.join(REPO, "PHASE2_RUN_r05.json"))
    os.makedirs(flags.base_out, exist_ok=True)

    env = dict(os.environ)
    if flags.tiny_cpu:
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()

    size = ["--synthetic_train_size", str(flags.synthetic_train_size)]
    tiny = ["--tiny"] if flags.tiny_cpu else []
    common = ["--climb_data_dir", "/tmp/climb_synth", "--synthetic",
              "--batch_size", "64", "--seed", "42",
              # must match the Phase I smoke runner's learnable-VQA head
              # shape so the low-shot transfer loads the upstream VQA head
              # instead of silently keeping a fresh 3,129-way one
              "--synthetic_vqa_labels", "16",
              # NOTE: the Phase I step-budget overrides (vqa.num_epochs=20
              # etc.) are deliberately NOT passed to the lowshot driver: the
              # low-shot trainers gate eval on fixed low_shot_config
              # eval_epochs, so a changed num_epochs only wastes (or starves)
              # unevaluated epochs. Checkpoint compatibility needs only the
              # head shape (--synthetic_vqa_labels above).
              # vision analog: 1000-way imagenet / 80-way coco-cls cannot
              # clear chance from random init at smoke scale (r03 cells read
              # 0.0) — shrink so every Phase II cell beats its baseline
              "--synthetic_vision_labels", "16"] + STEP_FLAGS + size + tiny
    if flags.task_config_overrides:
        common += ["--task_config_overrides", flags.task_config_overrides]

    runs = []

    if "lowshot" not in skip:
        phase1 = flags.phase1_out
        if flags.tiny_cpu:
            phase1 = os.path.join(flags.base_out, "phase1")
            with open(os.path.join(flags.base_out, "phase1.log"), "w") as logf:
                subprocess.run(
                    [sys.executable, "-m",
                     "climb_tpu.cli.train_upstream_continual_learning",
                     "--encoder_name", "vilt", "--pretrained_model_name", "scratch",
                     "--ordered_cl_tasks", TASKS, "--cl_algorithm", "sequential_ft",
                     "--output_dir", phase1, "--do_train",
                     "--synthetic_noise", "0.3",
                     # the rehearsal's Phase I run mirrors the Phase I smoke
                     # runner's calibrated budgets
                     "--task_config_overrides",
                     "vqa.lr=4e-4,vqa.num_epochs=20,"
                     "nlvr2.num_epochs=6,vcr.num_epochs=6"] + common,
                    env=env, cwd=REPO, check=True,
                    stdout=logf, stderr=subprocess.STDOUT)
        exp = f"vilt-sequential_ft-" + "-".join(
            f"task{i}_{t}" for i, t in enumerate(TASKS.split(",")))
        ckpt_root = os.path.join(phase1, exp, "checkpoints")
        if not os.path.isdir(ckpt_root):
            sys.exit(f"missing Phase I checkpoints at {ckpt_root} — run "
                     "exp_scripts/run_cl_smoke_tpu.py first or --skip lowshot")
        print("=== lowshot multimodal (6 transfer pairs) ===", flush=True)
        rec = run_driver(
            "train_lowshot_multimodal",
            [sys.executable, "-m", "climb_tpu.cli.train_lowshot_multimodal",
             "--encoder_name", "vilt", "--pretrained_model_name", "scratch",
             "--ordered_cl_tasks", TASKS, "--cl_algorithm", "sequential_ft",
             "--output_dir", phase1,
             # the Phase I r05 checkpoints were trained at this noise level —
             # the low-shot data keeps the same statistics
             "--synthetic_noise", "0.3",
             "--aspect_buckets", "384,640", "--text_buckets", "24,40"] + common,
            os.path.join(flags.base_out, "lowshot.log"), env)
        collect_results(rec, os.path.join(phase1, exp), ("lowshot_results.json",))
        runs.append(rec)
        print(f"    rc={rec['returncode']} wall={rec['wall_clock_s']}s", flush=True)

    if "language" not in skip:
        for task, catog in (("sst2", "vilt-l-seq"), ("piqa", "vilt-l-mc")):
            print(f"=== language {task} ({catog}) ===", flush=True)
            out_dir = os.path.join(flags.base_out, f"lang_{task}")
            rec = run_driver(
                f"train_language:{task}",
                [sys.executable, "-m", "climb_tpu.cli.train_language",
                 "--encoder_name", "vilt", "--checkpoint_name", "scratch",
                 "--task_name", task, "--model_catog", catog,
                 "--output_dir", out_dir,
                 "--num_shot", "16", "--subsample_seed", "10"] + common,
                os.path.join(flags.base_out, f"lang_{task}.log"), env)
            collect_results(rec, out_dir, ())
            runs.append(rec)
            print(f"    rc={rec['returncode']} wall={rec['wall_clock_s']}s", flush=True)

    if "vision" not in skip:
        vtasks = [tuple(it.split(":")) for it in flags.vision_tasks.split(",") if it]
        for task, shot in vtasks:
            print(f"=== vision {task} ===", flush=True)
            out_dir = os.path.join(flags.base_out, f"vis_{task}")
            rec = run_driver(
                f"train_vision:{task}",
                [sys.executable, "-m", "climb_tpu.cli.train_vision",
                 "--encoder_name", "vilt", "--checkpoint_name", "scratch",
                 "--task_name", task, "--output_dir", out_dir,
                 "--num_shot", shot, "--subsample_seed", "10"] + common,
                os.path.join(flags.base_out, f"vis_{task}.log"), env)
            collect_results(rec, out_dir, ())
            runs.append(rec)
            print(f"    rc={rec['returncode']} wall={rec['wall_clock_s']}s", flush=True)

    import platform
    results = {
        "what": "Phase II drivers end-to-end on hardware — low-shot multimodal "
                "transfer (6 pairs over the Phase I checkpoints), language-only "
                "(seq + multiple-choice), vision-only (CE + coco-cls BCE) — "
                "full-size ViLT, production step config, synthetic data "
                "(host-bound loader on this 1-core VM)",
        "platform": "cpu-rehearsal" if flags.tiny_cpu else "tpu",
        "host": platform.node(),
        "config": {"batch_size": 64,
                   "synthetic_train_size": flags.synthetic_train_size,
                   "step_flags": " ".join(STEP_FLAGS)},
        "runs": runs,
    }
    # merge into an existing artifact (same platform): records key on driver
    # name, so a partial re-run (e.g. --skip lowshot,language) replaces only
    # its own legs instead of clobbering the whole evidence file
    if os.path.exists(flags.out):
        with open(flags.out) as f:
            prior = json.load(f)
        if prior.get("platform") == results["platform"]:
            fresh = {r["driver"] for r in runs}
            results["runs"] = [r for r in prior.get("runs", [])
                               if r["driver"] not in fresh] + runs
    with open(flags.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {flags.out}")
    bad = [r["driver"] for r in runs
           if r["returncode"] != 0 or not r.get("results")]
    if bad:
        print(f"FAILED: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
