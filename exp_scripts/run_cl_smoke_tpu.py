"""Miniature but COMPLETE Phase I CL experiment on the real TPU chip.

Everything bench.py does NOT cover: the full driver call stack of the
reference's Phase I (``src/train/train_upstream_continual_learning.py:42-332``,
SURVEY.md section 3.1) executed end-to-end on hardware — the 4-task loop
(VQA -> NLVR2 -> SNLI-VE -> VCR), CL-algorithm hooks (ER buffer + replay
steps), per-task checkpoint save, elastic per-epoch full-state checkpoints
with the async writer, the bucketed jit-specialization ladder (aspect + text
buckets + per-shape auto grad-accum), per-epoch eval, and the
transfer/forgetting evaluation phase.

Data is synthetic (this environment has no downloads) but full-size: the real
ViLT-B/32 architecture on the real 384x640 canvas at the reference's global
batch 64. Steps per task are kept at the ~50-300 scale by the synthetic train
size; host-side example generation on this 1-core VM is the known bottleneck
(CLAUDE.md), so the per-task ex/s recorded here is a HOST-bound number — the
device-step throughput headline lives in bench.py / BENCH_r03.json.

Writes CL_RUN_r03.json at the repo root:
  per-algorithm: wall-clock, per-task best scores/epochs + train wall-clock +
  epoch ex/s samples, eval_results (forgetting matrix), compile-cache
  population delta (files added to the persistent XLA cache).

Usage (on the real TPU; ~1-1.5h per algorithm, mostly tunnel compiles on the
cold cache):
  python exp_scripts/run_cl_smoke_tpu.py [--out CL_RUN_r03.json] [--tiny-cpu]
      [--algorithms sequential_ft,experience_replay,adapter,ewc]
      [--encoder vilt|viltbert] [--tasks vqa,nlvr2,...]

Re-invocations MERGE into an existing artifact: records are keyed on
(encoder, algorithm), so each hardware run extends CL_RUN_r03.json rather
than clobbering it.

--tiny-cpu runs the identical flow on the 8-device CPU platform with the tiny
model config (~5 min per algorithm) — the rehearsal mode this script was
validated with; its artifact defaults to /tmp, never the committed one.
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


def cache_file_count() -> int:
    if not os.path.isdir(CACHE_DIR):
        return 0
    return sum(len(fs) for _, _, fs in os.walk(CACHE_DIR))


def driver_argv(algorithm: str, out_dir: str, tiny_cpu: bool,
                encoder: str = "vilt", tasks: str = TASKS) -> list:
    argv = [
        sys.executable, "-m", "climb_tpu.cli.train_upstream_continual_learning",
        "--encoder_name", encoder,
        "--pretrained_model_name", "scratch",
        "--ordered_cl_tasks", tasks,
        "--cl_algorithm", algorithm,
        "--climb_data_dir", "/tmp/climb_synth",
        "--output_dir", out_dir,
        "--do_train", "--do_eval",
        "--synthetic",
        "--batch_size", "64",
        "--seed", "42",
        # the production step config (bench.py headline)
        "--compute_dtype", "bfloat16",
        "--remat", "--remat_policy", "selective",
        "--scan_unroll", "12",
        "--grad_accum_steps", "auto",
        # bucketed input ladder: 2 canvas widths x 2 text lengths per task
        # (kept at 4 combos/task — each distinct shape is a 1-2 min tunnel
        # compile on the cold cache)
        "--aspect_buckets", "384,640",
        "--text_buckets", "24,40",
        # elastic checkpointing with the background writer (I/O overlap)
        "--save_state_epochs", "1",
        "--async_checkpoint",
        "--synthetic_train_size", "512",
    ]
    if algorithm == "experience_replay":
        # reference settings (exp_scripts/.../vilt-experience_replay.sh):
        # 1% memory, replay every 100 steps
        argv += ["--memory_percentage", "0.01",
                 "--memory_sampling_strategy", "random",
                 "--replay_frequency", "100"]
    elif algorithm == "adapter":
        # the paper's flagship algorithm — per-task Houlsby adapters at the
        # reference reduction (exp_scripts/.../vilt-adapter_vanilla.sh)
        argv += ["--adapter_method", "vanilla",
                 "--adapter_config", "houlsby",
                 "--adapter_reduction_factor", "16"]
    elif algorithm == "ewc":
        # reference settings (exp_scripts/.../vilt-ewc.sh)
        argv += ["--ewc_fisher_sample_percentage", "0.01",
                 "--ewc_loss_weight", "100.0"]
    elif algorithm == "freeze_bottom_k_layers":
        # the paper setting (exp_scripts/.../vilt-freeze_bottom9layers.sh)
        argv += ["--layers_to_freeze", "9"]
    if tiny_cpu:
        argv += ["--tiny", "--synthetic_train_size", "128"]
    return argv


# driver log lines this script mines (climb_tpu/cli + train/trainers.py)
RE_TRAIN_START = re.compile(r"(\d\d:\d\d:\d\d).*Training on task #(\d+): (.+)")
RE_EPOCH = re.compile(
    r"(\d\d:\d\d:\d\d).*task=(\S+) epoch (\d+)/(\d+): score=([\d.]+) \(([\d.]+) ex/s\)"
)
RE_BEST = re.compile(r"(\d\d:\d\d:\d\d).*Best (.+) score = ([\d.-]+) \(epoch (\d+)\)")


def hms_to_s(hms: str) -> int:
    h, m, s = hms.split(":")
    return int(h) * 3600 + int(m) * 60 + int(s)


def parse_log(log_path: str) -> dict:
    """Per-task wall-clock + per-epoch ex/s samples from driver log lines."""
    tasks, order = {}, []
    with open(log_path, errors="replace") as f:
        for line in f:
            m = RE_TRAIN_START.search(line)
            if m:
                key = m.group(3).strip()
                tasks[key] = {"start_s": hms_to_s(m.group(1)), "epochs": []}
                order.append(key)
                continue
            m = RE_EPOCH.search(line)
            if m and order:
                tasks[order[-1]]["epochs"].append(
                    {"epoch": int(m.group(3)), "dev_score": float(m.group(5)),
                     "train_ex_per_s": float(m.group(6)),
                     "t_s": hms_to_s(m.group(1))}
                )
                continue
            m = RE_BEST.search(line)
            if m and order:
                t = tasks[order[-1]]
                t["best_score"] = float(m.group(3))
                t["best_epoch"] = int(m.group(4))
                end = hms_to_s(m.group(1))
                # wrap-around (run crossing midnight)
                if end < t["start_s"]:
                    end += 24 * 3600
                t["train_wall_s"] = end - t["start_s"]
    for t in tasks.values():
        t.pop("start_s", None)
    return tasks


def run_algorithm(algorithm: str, base_out: str, tiny_cpu: bool,
                  encoder: str = "vilt", tasks: str = TASKS) -> dict:
    out_dir = os.path.join(base_out, f"{encoder}-{algorithm}"
                           if encoder != "vilt" else algorithm)
    os.makedirs(out_dir, exist_ok=True)
    log_path = os.path.join(out_dir, "driver.log")
    argv = driver_argv(algorithm, out_dir, tiny_cpu, encoder, tasks)

    env = dict(os.environ)
    if tiny_cpu:
        env.pop("PALLAS_AXON_POOL_IPS", None)  # no remote-TPU auto-register
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()

    cache_before = cache_file_count()
    t0 = time.time()
    with open(log_path, "w") as logf:
        rc = subprocess.run(argv, env=env, cwd=REPO,
                            stdout=logf, stderr=subprocess.STDOUT).returncode
    wall = time.time() - t0
    cache_after = cache_file_count()

    exp_dirs = [d for d in os.listdir(out_dir)
                if os.path.isdir(os.path.join(out_dir, d))]
    record = {
        "algorithm": algorithm,
        "encoder": encoder,
        "task_order": tasks,
        "returncode": rc,
        "wall_clock_s": round(wall, 1),
        "compile_cache_files_added": cache_after - cache_before,
        "tasks": parse_log(log_path),
        "log": os.path.relpath(log_path, REPO),
    }
    for d in exp_dirs:
        for name in ("results.json", "eval_results.json"):
            p = os.path.join(out_dir, d, name)
            if os.path.exists(p):
                with open(p) as f:
                    record[name.replace(".json", "")] = json.load(f)
    return record


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None,
                    help="artifact path (default: CL_RUN_r03.json at the repo "
                         "root; a CPU rehearsal defaults to /tmp so it can "
                         "never clobber the committed TPU artifact)")
    ap.add_argument("--base-out", default=None,
                    help="experiment output root (default: a per-platform "
                         "dir, so a CPU rehearsal's checkpoints can never be "
                         "picked up by the TPU run's resume logic)")
    ap.add_argument("--tiny-cpu", action="store_true",
                    help="rehearse the identical flow on the CPU mesh (~5 min)")
    ap.add_argument("--algorithms", default="sequential_ft,experience_replay")
    ap.add_argument("--encoder", default="vilt", choices=["vilt", "viltbert"],
                    help="encoder family (viltbert = frozen-BERT text side)")
    ap.add_argument("--tasks", default=TASKS,
                    help="comma-separated ordered task keys (subset runs keep "
                         "the compile ladder small for the slower encoder)")
    flags = ap.parse_args()
    if flags.base_out is None:
        flags.base_out = ("/tmp/climb_cl_smoke_cpu" if flags.tiny_cpu
                          else "/tmp/climb_cl_smoke_tpu")
    if flags.out is None:
        flags.out = ("/tmp/climb_cl_smoke_cpu/CL_RUN_rehearsal.json"
                     if flags.tiny_cpu else os.path.join(REPO, "CL_RUN_r03.json"))
        os.makedirs(os.path.dirname(flags.out), exist_ok=True)

    import platform

    results = {
        "what": "complete Phase I CL experiment (driver end-to-end) — "
                "4 tasks, production bucketed step config, full-size ViLT, "
                "synthetic data (host-bound loader on this 1-core VM; device "
                "throughput headline is bench.py's)",
        "platform": "cpu-rehearsal" if flags.tiny_cpu else "tpu",
        "host": platform.node(),
        # step config shared by every run; per-run settings (encoder,
        # task_order) live in each run record
        "config": {
            "batch_size": 64,
            "synthetic_train_size": 128 if flags.tiny_cpu else 512,
            "compute_dtype": "bfloat16", "remat": "selective",
            "scan_unroll": 12, "grad_accum_steps": "auto",
            "aspect_buckets": "384,640", "text_buckets": "24,40",
            "save_state_epochs": 1, "async_checkpoint": True,
        },
        "runs": [],
    }
    # accumulate into an existing artifact: re-running one (encoder, algorithm)
    # replaces its record, new combinations append after the existing ones
    rerun = {(flags.encoder, a) for a in flags.algorithms.split(",")}
    if os.path.exists(flags.out):
        with open(flags.out) as f:
            prior = json.load(f)
        if prior.get("platform") == results["platform"]:
            results["runs"] = [
                r for r in prior.get("runs", [])
                if (r.get("encoder", "vilt"), r["algorithm"]) not in rerun
            ]
    for algorithm in flags.algorithms.split(","):
        print(f"=== {flags.encoder}-{algorithm} ===", flush=True)
        rec = run_algorithm(algorithm, flags.base_out, flags.tiny_cpu,
                            flags.encoder, flags.tasks)
        results["runs"].append(rec)
        ok = rec["returncode"] == 0 and "eval_results" in rec
        print(f"    rc={rec['returncode']} wall={rec['wall_clock_s']}s "
              f"cache+={rec['compile_cache_files_added']} "
              f"eval={'ok' if ok else 'MISSING'}", flush=True)
        with open(flags.out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {flags.out}")
    bad = [r["algorithm"] for r in results["runs"]
           if r["returncode"] != 0 or "eval_results" not in r]
    if bad:
        print(f"FAILED: {bad}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
