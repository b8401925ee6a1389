"""Aggregate the Phase II smoke-run outputs into the paper-style tables.

Round-3 verdict item 8: prove the results-JSON layouts compose end-to-end by
running ``climb_tpu.evaluation.make_table`` (parity:
``/root/reference/src/utils/make_table.py:11-44``) over the result files the
Phase II drivers actually wrote on hardware (``PHASE2_RUN_r03/r04``).

The smoke runner keeps per-driver output dirs (``lang_sst2/``, ``vis_coco-cls/``
...); the reference's aggregation expects one results root with ``lang_only/``
and ``vision_only/`` subdirs (plus ``lang_only/viltbert/`` for the second
encoder). This script stages the smoke outputs into that layout (symlinks),
runs the real aggregation entry point per task, and writes one artifact with
every rendered table.

Usage:
  python exp_scripts/make_phase2_table.py \
      [--phase2-root /tmp/climb_phase2_smoke_tpu] [--out PHASE2_TABLE_r04.json]
"""

import argparse
import glob
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from climb_tpu.evaluation.make_table import VISION_TASKS, main as make_table  # noqa: E402


def stage(phase2_root: str, staged: str) -> dict:
    """Symlink per-driver smoke outputs into the reference results layout.

    Returns {task_name: n_files_staged}. Results written by a viltbert
    language run (``lang_{task}_viltbert`` dirs) land in the
    ``lang_only/viltbert/`` subdir the aggregator reads ViLTBERT rows from."""
    lang = os.path.join(staged, "lang_only")
    vis = os.path.join(staged, "vision_only")
    os.makedirs(os.path.join(lang, "viltbert"), exist_ok=True)
    os.makedirs(vis, exist_ok=True)
    tasks = {}
    for d in sorted(os.listdir(phase2_root)):
        src_dir = os.path.join(phase2_root, d)
        if not os.path.isdir(src_dir):
            continue
        if d.startswith("lang_"):
            dst = (os.path.join(lang, "viltbert")
                   if d.endswith("_viltbert") else lang)
        elif d.startswith("vis_"):
            dst = vis
        else:
            continue
        for fn in glob.glob(os.path.join(src_dir, "*_results.json")):
            base = os.path.basename(fn)
            task = base.split("_")[0]
            link = os.path.join(dst, base)
            if not os.path.exists(link):
                os.symlink(os.path.abspath(fn), link)
            tasks[task] = tasks.get(task, 0) + 1
    return tasks


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase2-root", default="/tmp/climb_phase2_smoke_tpu",
                    help="base_out of exp_scripts/run_phase2_smoke_tpu.py")
    ap.add_argument("--out", default=os.path.join(REPO, "PHASE2_TABLE_r04.json"))
    flags = ap.parse_args(argv)

    with tempfile.TemporaryDirectory() as tmp:
        staged_tasks = stage(flags.phase2_root, tmp)
        if not staged_tasks:
            print(f"no Phase II result files under {flags.phase2_root}",
                  file=sys.stderr)
            sys.exit(1)
        tables = {}
        for task in sorted(staged_tasks):
            out_fn = make_table([task, "--results_root", tmp,
                                 "--out_dir", tmp])
            with open(out_fn) as f:
                tables[task] = json.load(f)

    artifact = {
        "what": "paper-style mean±std tables aggregated from the Phase II "
                "hardware smoke runs via climb_tpu.evaluation.make_table "
                "(reference src/utils/make_table.py) — proves the "
                "results-JSON layouts compose end-to-end",
        "source": flags.phase2_root,
        "files_per_task": staged_tasks,
        "vision_tasks": [t for t in staged_tasks if t in VISION_TASKS],
        "tables": tables,
    }
    with open(flags.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {flags.out}")
    return artifact


if __name__ == "__main__":
    main()
