"""Render a CL_RUN artifact (Phase I hardware smoke runs) as markdown.

The reference publishes Phase I as paper tables (upstream transfer gain per
algorithm, forgetting matrices); ``run_cl_smoke_tpu.py`` records the raw
driver outputs. This renders the committed artifact into the same shape a
reader of the paper expects: one row per (encoder, algorithm) with per-task
best scores + relative transfer gains, plus a forgetting matrix per run.

Usage: python exp_scripts/render_cl_run.py [CL_RUN_r05.json] [--out docs/RESULTS_r05.md]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def fmt(x, nd=2):
    return "—" if x is None else f"{x:.{nd}f}"


def render(artifact: dict) -> str:
    cfg = artifact.get("config", {})
    vqa_labels = cfg.get("synthetic_vqa_labels")
    lines = [
        "# Phase I hardware results",
        "",
        f"Source: `{artifact.get('what', '')[:80]}...` — platform "
        f"**{artifact.get('platform')}**, synthetic data "
        f"(batch {cfg.get('batch_size')}, "
        f"{cfg.get('synthetic_train_size')} examples/task"
        + (f", learnable, {vqa_labels}-answer VQA smoke space"
           if vqa_labels else "")
        + "). Per-task ex/s is host-bound on the 1-core dev VM; the "
        "device-step headline lives in bench.py / BENCH artifacts.",
        "",
        "## Best dev score per task (and relative transfer gain vs singletask)",
        "",
    ]
    runs = artifact.get("runs", [])
    task_order = []
    for r in runs:
        for t in r.get("task_order", "").split(","):
            if t and t not in task_order:
                task_order.append(t)
    header = "| encoder | algorithm | rc | wall | " + " | ".join(task_order) + " |"
    sep = "|" + "---|" * (4 + len(task_order))
    lines += [header, sep]
    for r in runs:
        ev = (r.get("eval_results") or {}).get("upstream_knowledge_transfer", {})
        # singletask_ft records one results.json per task instead
        by_task = {}
        if r["algorithm"] == "singletask_ft":
            for exp, res in (r.get("results") or {}).items():
                if not isinstance(res, list):
                    continue
                for entry in res:
                    by_task[entry.get("task_key")] = (
                        f"{entry.get('best_score', 0):.2f}")
        cells = []
        for t in task_order:
            if t in by_task:
                cells.append(by_task[t])
            elif t in ev:
                g = ev[t].get("relative_gain")
                gain = "—" if g is None else f"{g:+.1f}%"
                cells.append(f"{fmt(ev[t].get('cl_task_score'))} ({gain})")
            else:
                cells.append("—")
        wall = f"{r.get('wall_clock_s', 0) / 60:.0f}m"
        lines.append(
            f"| {r.get('encoder', 'vilt')} | {r['algorithm']} | "
            f"{r['returncode']} | {wall} | " + " | ".join(cells) + " |")
    lines += [
        "",
        "Cell format for CL algorithms: `best dev score (relative gain vs "
        "the same-encoder singletask_ft baseline)` — the benchmark's "
        "headline Phase I metric (reference evaluate_cl_algorithm.py:63-65).",
        "",
        "## Forgetting matrices",
        "",
        "`forgetting%` after training later tasks (reference "
        "evaluate_cl_algorithm.py's transfer_tasks convention: row = "
        "evaluated-after task, col = earlier task).",
        "",
    ]
    for r in runs:
        fg = (r.get("eval_results") or {}).get("forgetting")
        if not fg:
            continue
        lines.append(f"### {r.get('encoder', 'vilt')}-{r['algorithm']}")
        lines.append("")
        cols = task_order[:-1]
        lines.append("| after training | " + " | ".join(cols) + " |")
        lines.append("|" + "---|" * (1 + len(cols)))
        for cur, row in fg.items():
            cells = []
            for prev in cols:
                e = row.get(prev)
                cells.append("—" if e is None
                             else f"{fmt(e.get('forgetting'), 1)}%")
            lines.append(f"| {cur} | " + " | ".join(cells) + " |")
        lines.append("")
        er_steps = {k: v.get("replay_steps") for k, v in
                    (r.get("tasks") or {}).items() if v.get("replay_steps")}
        if er_steps:
            lines.append(f"Replay steps executed: {er_steps}")
            lines.append("")
    return "\n".join(lines) + "\n"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact", nargs="?",
                    default=os.path.join(REPO, "CL_RUN_r05.json"))
    ap.add_argument("--out", default=None,
                    help="output .md path (default: stdout)")
    flags = ap.parse_args(argv)
    with open(flags.artifact) as f:
        artifact = json.load(f)
    md = render(artifact)
    if flags.out:
        with open(flags.out, "w") as f:
            f.write(md)
        print(f"wrote {flags.out}")
    else:
        sys.stdout.write(md)
    return md


if __name__ == "__main__":
    main()
