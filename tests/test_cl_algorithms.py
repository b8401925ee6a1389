"""Unit tests: CL algorithm mechanics (masks, EWC math, ER buffers, eval formulas)."""

import random
from types import SimpleNamespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from climb_tpu.cl.freeze import (
    adapter_only_mask,
    freeze_bottom_k_layers_mask,
    freeze_encoder_mask,
)
from climb_tpu.evaluation import forgetting_percentage, relative_gain
from climb_tpu.train.train_step import EwcRef, ewc_penalty


def fake_params():
    return {
        "vilt": {
            "word_embeddings": np.zeros((10, 4)),
            "encoder": {
                "q": {"kernel": np.zeros((3, 4, 4)), "bias": np.zeros((3, 4))},
                "ln1": {"scale": np.zeros((3, 4)), "bias": np.zeros((3, 4))},
            },
            "pooler": {"kernel": np.zeros((4, 4)), "bias": np.zeros((4,))},
            "final_layernorm": {"scale": np.zeros((4,)), "bias": np.zeros((4,))},
            "adapter_mlp_snli_ve": {"down": {"kernel": np.zeros((4, 2))}},
            "adapter_mlp_vqa": {"down": {"kernel": np.zeros((4, 2))}},
        },
        "head_snli_ve": {"fc": {"kernel": np.zeros((4, 3))}},
        "head_vqa": {"fc": {"kernel": np.zeros((4, 5))}},
    }


def test_freeze_encoder_mask():
    m = freeze_encoder_mask(fake_params())
    assert float(m["vilt"]["word_embeddings"]) == 0.0
    assert float(m["vilt"]["encoder"]["q"]["kernel"]) == 0.0
    assert float(m["head_snli_ve"]["fc"]["kernel"]) == 1.0


def test_freeze_bottom_k_mask():
    m = freeze_bottom_k_layers_mask(fake_params(), k=2, num_layers=3)
    qk = np.asarray(m["vilt"]["encoder"]["q"]["kernel"])
    assert qk.shape == (3, 1, 1)
    np.testing.assert_array_equal(qk[:, 0, 0], [0.0, 0.0, 1.0])
    assert float(m["vilt"]["word_embeddings"]) == 0.0  # embeddings frozen
    assert float(m["vilt"]["pooler"]["kernel"]) == 1.0
    assert float(m["head_vqa"]["fc"]["kernel"]) == 1.0


def test_adapter_only_mask():
    m = adapter_only_mask(fake_params(), "snli-ve")
    assert float(m["vilt"]["adapter_mlp_snli_ve"]["down"]["kernel"]) == 1.0
    assert float(m["vilt"]["adapter_mlp_vqa"]["down"]["kernel"]) == 0.0
    assert float(m["head_snli_ve"]["fc"]["kernel"]) == 1.0
    assert float(m["head_vqa"]["fc"]["kernel"]) == 0.0
    assert float(m["vilt"]["encoder"]["q"]["kernel"]) == 0.0


def test_ewc_penalty_math():
    fisher = {"w": jnp.array([1.0, 2.0])}
    anchor = {"w": jnp.array([0.5, 1.0])}
    params = {"w": jnp.array([1.5, 0.0])}
    ref = EwcRef(fisher=fisher, anchor=anchor, weight=jnp.asarray(10.0))
    # 10 * (1*(1.5-0.5)^2 + 2*(0-1)^2) = 10 * 3 = 30
    assert float(ewc_penalty(params, ref)) == pytest.approx(30.0)


def test_eval_formulas():
    # reference evaluate_cl_algorithm.py:63-65 and :130
    assert relative_gain(80.0, 75.0, 50.0) == pytest.approx(20.0)
    assert forgetting_percentage(80.0, 70.0, 50.0) == pytest.approx(100.0 * 10 / 30)


def test_er_buffer_sampling():
    from climb_tpu.cl import ExperienceReplayMemory

    class FakeTrainer:
        lr, weight_decay, adam_epsilon, warmup_ratio, max_steps = 1e-4, 0.0, 1e-8, 0.1, 10
        loss_type = "ce"

        def __init__(self, ds):
            self._ds = ds

        def get_train_dataloader(self):
            return SimpleNamespace(dataset=self._ds)

        def get_collate_fn(self):
            from climb_tpu.data.collation import stack_collate

            return stack_collate

    ds = [{"x": np.full((2,), i, np.float32)} for i in range(100)]
    random.seed(0)
    mem = ExperienceReplayMemory()
    args = SimpleNamespace(batch_size=8)
    mem.add_task_memory_buffer(args, "snli-ve", {"task_name": "SNLI-VE"},
                               FakeTrainer(ds), 0.2, "random")
    buf = mem.memory_buffers["snli-ve"]
    assert len(buf) == 20  # 20% of 100
    batch = buf.sample_replay_batch()
    assert batch["x"].shape == (8, 2)
    # sampled examples come from the memory buffer only
    sampled_ids = set(batch["x"][:, 0].astype(int).tolist())
    assert sampled_ids <= set(int(ds[i]["x"][0]) for i in buf.memory_idxs)
    # per-task batch divisors (reference experience_replay.py:93-98)
    mem.add_task_memory_buffer(args, "nlvr2", {"task_name": "N"}, FakeTrainer(ds), 0.2, "random")
    mem.add_task_memory_buffer(args, "vcr", {"task_name": "V"}, FakeTrainer(ds), 0.2, "random")
    assert mem.memory_buffers["nlvr2"].batch_size == 4
    assert mem.memory_buffers["vcr"].batch_size == 2
    # random-balanced needs class labels (implemented beyond the reference,
    # see test_er_buffer_random_balanced); label-less datasets reject it
    with pytest.raises(NotImplementedError):
        mem.add_task_memory_buffer(args, "x", {"task_name": "X"}, FakeTrainer(ds), 0.2,
                                   "random-balanced")


def test_make_table(tmp_path):
    import json

    from climb_tpu.evaluation.make_table import main as make_table_main

    lang = tmp_path / "lang_only"
    lang.mkdir()
    # filename shape produced by the drivers: {task}_{upstream}_results.json
    # where upstream is e.g. 'task0_vqa' (singletask) or 'task1_nlvr2_sequent'
    (lang / "sst2_task0_vqa_results.json").write_text(json.dumps({
        "nshot-16": {"seed-10": (80.0, 82.0, 8), "seed-50": (78.0, 81.0, 6)},
    }))
    (lang / "sst2_task1_nlvr2_sequent_results.json").write_text(json.dumps({
        "nshot-16": {"seed-10": (70.0, 72.0, 8)},
    }))
    out = make_table_main(["sst2", "--results_root", str(tmp_path), "--out_dir", str(tmp_path)])
    table = json.loads(open(out).read())
    assert table["ViLT"]["single"]["task0"]["vqa"]["16"].startswith("79.0")
    assert table["ViLT"]["sequent"]["task1"]["nlvr2"]["16"].startswith("70.0")


def test_loader_host_sharding():
    """Per-host index striping: disjoint and complete across hosts."""
    from climb_tpu.data.collation import stack_collate
    from climb_tpu.data.loader import DataLoader

    ds = [{"x": np.int32(i)} for i in range(20)]
    a = DataLoader(ds, 4, stack_collate, host_id=0, host_count=2)
    b = DataLoader(ds, 4, stack_collate, host_id=1, host_count=2)
    xa = np.concatenate([bt["x"][bt["valid"].astype(bool)] for bt in a])
    xb = np.concatenate([bt["x"][bt["valid"].astype(bool)] for bt in b])
    assert len(set(xa) & set(xb)) == 0
    assert len(set(xa) | set(xb)) == 20


def test_er_buffer_random_balanced():
    """'random-balanced' (NotImplementedError in the reference) fills the
    buffer round-robin across classes — rare classes keep representation."""
    from climb_tpu.cl import ExperienceReplayMemory
    from climb_tpu.cl.experience_replay import _balanced_sample

    class FakeTrainer:
        lr, weight_decay, adam_epsilon, warmup_ratio, max_steps = 1e-4, 0.0, 1e-8, 0.1, 10
        loss_type = "ce"

        def __init__(self, ds):
            self._ds = ds

        def get_train_dataloader(self):
            return SimpleNamespace(dataset=self._ds)

        def get_collate_fn(self):
            from climb_tpu.data.collation import stack_collate

            return stack_collate

    # skewed dataset: 90 of class 0, 10 of class 1, exposed via .data labels
    class DS(list):
        pass

    ds = DS({"x": np.full((2,), i, np.float32)} for i in range(100))
    ds.data = [{"label": 0 if i < 90 else 1} for i in range(100)]

    random.seed(0)
    mem = ExperienceReplayMemory()
    args = SimpleNamespace(batch_size=8)
    mem.add_task_memory_buffer(args, "snli-ve", {"task_name": "SNLI-VE"},
                               FakeTrainer(ds), 0.2, "random-balanced")
    buf = mem.memory_buffers["snli-ve"]
    assert len(buf) == 20
    by_class = {0: 0, 1: 0}
    for i in buf.memory_idxs:
        by_class[ds.data[i]["label"]] += 1
    assert by_class == {0: 10, 1: 10}  # balanced, not 18/2

    # direct sampler: caps at class availability
    random.seed(1)
    idx = _balanced_sample([0] * 3 + [1] * 50, 10)
    labels = [0 if i < 3 else 1 for i in idx]
    assert labels.count(0) == 3 and labels.count(1) == 7

    # soft-target tasks without class labels reject the strategy clearly
    ds2 = DS({"x": np.zeros(2, np.float32)} for _ in range(10))
    with pytest.raises(NotImplementedError, match="random-balanced"):
        mem.add_task_memory_buffer(args, "vqa", {"task_name": "VQAv2"},
                                   FakeTrainer(ds2), 0.5, "random-balanced")
