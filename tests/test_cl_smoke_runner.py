"""Unit coverage for the Phase I hardware smoke runner's artifact plumbing
(exp_scripts/run_cl_smoke_tpu.py): singletask_ft baseline exposure via
symlinks (the reference keeps all experiment dirs under one --output_dir,
``evaluate_cl_algorithm.py:40-46``; the runner keeps per-algorithm roots),
multi-experiment result collection, and eval-refresh record preservation.

The end-to-end flow (driver runs included) is rehearsed on the CPU mesh via
``run_cl_smoke_tpu.py --tiny-cpu``; these tests pin the pure plumbing so the
hardware runs can't be silently mis-recorded.
"""

import importlib.util
import json
import os

import pytest

RUNNER = os.path.join(os.path.dirname(__file__), "..",
                      "exp_scripts", "run_cl_smoke_tpu.py")


@pytest.fixture(scope="module")
def runner():
    spec = importlib.util.spec_from_file_location("run_cl_smoke_tpu", RUNNER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _mk_singletask(base_out, tasks, encoder="vilt"):
    st = os.path.join(base_out, "singletask_ft")
    for task in tasks:
        d = os.path.join(st, f"{encoder}-singletask_ft-task0_{task}")
        os.makedirs(d)
        with open(os.path.join(d, "results.json"), "w") as f:
            json.dump([{"task_key": task, "best_score": 50.0}], f)
    return st


def test_link_singletask_results(runner, tmp_path):
    base = str(tmp_path)
    _mk_singletask(base, ["snli-ve", "nlvr2"])
    out_dir = os.path.join(base, "sequential_ft")
    os.makedirs(out_dir)
    runner.link_singletask_results(out_dir, base, "vilt")
    for task in ("snli-ve", "nlvr2"):
        link = os.path.join(out_dir, f"vilt-singletask_ft-task0_{task}")
        assert os.path.islink(link)
        # the transfer eval reads this exact path (cl_eval.py:49-52)
        with open(os.path.join(link, "results.json")) as f:
            assert json.load(f)[0]["task_key"] == task
    # idempotent: a second call must not raise on existing links
    runner.link_singletask_results(out_dir, base, "vilt")
    # other-encoder dirs are not linked
    assert not os.path.exists(os.path.join(out_dir,
                                           "viltbert-singletask_ft-task0_vqa"))


def test_collect_results_single_and_multi(runner, tmp_path):
    # one experiment dir (a normal CL run) -> flat keys, links ignored
    base = str(tmp_path)
    _mk_singletask(base, ["snli-ve", "nlvr2"])
    out_dir = os.path.join(base, "sequential_ft")
    exp = os.path.join(out_dir, "vilt-sequential_ft-task0_snli-ve-task1_nlvr2")
    os.makedirs(exp)
    runner.link_singletask_results(out_dir, base, "vilt")
    with open(os.path.join(exp, "results.json"), "w") as f:
        json.dump([{"task_key": "snli-ve", "best_score": 40.0}], f)
    with open(os.path.join(exp, "eval_results.json"), "w") as f:
        json.dump({"forgetting": {}}, f)
    rec = {}
    runner.collect_results(rec, out_dir)
    assert rec["results"][0]["best_score"] == 40.0
    assert rec["eval_results"] == {"forgetting": {}}

    # several experiment dirs (singletask_ft) -> keyed by experiment dir
    st_dir = os.path.join(base, "singletask_ft")
    rec = {}
    runner.collect_results(rec, st_dir)
    assert sorted(rec["results"]) == ["vilt-singletask_ft-task0_nlvr2",
                                      "vilt-singletask_ft-task0_snli-ve"]
    assert rec["results"]["vilt-singletask_ft-task0_snli-ve"][0][
        "best_score"] == 50.0


def test_refresh_eval_preserves_training_telemetry(runner, tmp_path,
                                                   monkeypatch):
    """refresh_eval must re-run the driver and update results/eval_results
    WITHOUT touching the original run's training telemetry."""
    base = str(tmp_path)
    out_dir = os.path.join(base, "sequential_ft")
    exp = os.path.join(out_dir, "vilt-sequential_ft-task0_snli-ve")
    os.makedirs(exp)

    def fake_run_driver(argv, log_path, tiny_cpu, append=False):
        # the refreshed eval writes a non-null relative gain
        with open(os.path.join(exp, "eval_results.json"), "w") as f:
            json.dump({"upstream_knowledge_transfer": {
                "snli-ve": {"relative_gain": -3.0}}}, f)
        return 0

    monkeypatch.setattr(runner, "run_driver", fake_run_driver)
    record = {"algorithm": "sequential_ft", "encoder": "vilt",
              "task_order": "snli-ve",
              "wall_clock_s": 123.0, "tasks": {"SNLI-VE": {"epochs": []}}}
    out = runner.refresh_eval(record, base, tiny_cpu=True)
    assert out["eval_refresh"]["returncode"] == 0
    assert out["wall_clock_s"] == 123.0          # telemetry preserved
    assert out["tasks"] == {"SNLI-VE": {"epochs": []}}
    assert out["eval_results"]["upstream_knowledge_transfer"][
        "snli-ve"]["relative_gain"] == -3.0


def test_refresh_eval_failure_keeps_old_results(runner, tmp_path,
                                                monkeypatch):
    base = str(tmp_path)
    os.makedirs(os.path.join(base, "sequential_ft"))
    monkeypatch.setattr(runner, "run_driver",
                        lambda *a, **k: 1)  # driver fails
    record = {"algorithm": "sequential_ft", "encoder": "vilt",
              "task_order": "snli-ve", "eval_results": {"old": True}}
    out = runner.refresh_eval(record, base, tiny_cpu=True)
    assert out["eval_refresh"]["returncode"] == 1
    assert out["eval_results"] == {"old": True}  # not clobbered


def test_make_phase2_table_stages_and_aggregates(tmp_path):
    """exp_scripts/make_phase2_table.py stages per-driver smoke outputs into
    the reference results layout (lang_only/, vision_only/, viltbert subdir)
    and the real make_table aggregation renders every staged task (round-3
    verdict item 8; reference src/utils/make_table.py:11-44)."""
    spec = importlib.util.spec_from_file_location(
        "make_phase2_table",
        os.path.join(os.path.dirname(RUNNER), "make_phase2_table.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    root = tmp_path / "phase2"
    (root / "lang_sst2").mkdir(parents=True)
    (root / "lang_piqa_viltbert").mkdir()
    (root / "vis_imagenet").mkdir()
    (root / "lowshot").mkdir()  # not a lang_/vis_ dir: ignored
    (root / "lang_sst2" / "sst2_scratch_results.json").write_text(
        json.dumps({"nshot-16": {"seed-10": (80.0, 82.0, 8)}}))
    (root / "lang_piqa_viltbert" / "piqa_scratch_results.json").write_text(
        json.dumps({"nshot-16": {"seed-10": (60.0, 61.0, 3)}}))
    (root / "vis_imagenet" / "imagenet_scratch_results.json").write_text(
        json.dumps({"nshot-16": {"seed-10": (42.0, 41.0, 6)}}))

    out = tmp_path / "table.json"
    artifact = mod.main(["--phase2-root", str(root), "--out", str(out)])
    assert json.loads(out.read_text())["tables"] == artifact["tables"]
    t = artifact["tables"]
    # language: backbone-keyed, mean ±std strings; viltbert run lands under
    # the ViLTBERT backbone via the lang_only/viltbert/ staging subdir
    assert t["sst2"]["ViLT"]["ViLT"]["task0"]["NA"]["16"] == "80.0 ±0.0"
    assert t["piqa"]["ViLTBERT"]["ViLTBERT"]["task0"]["NA"]["16"] == "60.0 ±0.0"
    # vision: single-seed test score, no backbone nesting
    assert t["imagenet"]["ViLT"]["task0"]["NA"]["16"] == "42.0"
    assert artifact["vision_tasks"] == ["imagenet"]
