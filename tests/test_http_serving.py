"""HTTP serving (climb_tpu/serve/server.py): the exported artifact behind
a request-coalescing batcher must reproduce the program's direct outputs,
fill device batches from concurrent requests, and fail requests with
actionable 4xx errors. Stdlib client (urllib) against an ephemeral port."""

import base64
import io
import json
import threading
import urllib.error
import urllib.request
from types import SimpleNamespace

import numpy as np
import pytest

from climb_tpu.configs import task_configs
from climb_tpu.data.processor import ViltInputProcessor
from climb_tpu.data.tokenization import HashTokenizer
from climb_tpu.serve import export_eval_step
from climb_tpu.serve.server import RequestBatcher, create_server
from climb_tpu.train import LOSS_TYPES, create_cl_model
from climb_tpu.train.train_step import make_eval_step

BS = 4


def tiny_args(**kw):
    base = dict(
        batch_size=BS, seed=0, synthetic=True, tiny=True,
        ordered_cl_tasks=["snli-ve"], encoder_name="vilt",
        pretrained_vilt_name="scratch", image_height=64, image_width=96,
    )
    base.update(kw)
    return SimpleNamespace(**base)


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    args = tiny_args()
    model = create_cl_model(args, task_configs)
    cfg = model.cfg
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], cfg.compute_dtype
    )
    rng = np.random.RandomState(0)
    batch = {
        "input_ids": rng.randint(1, cfg.vocab_size, (BS, cfg.max_text_len)).astype(np.int32),
        "text_mask": np.ones((BS, cfg.max_text_len), np.float32),
        "pixel_values": rng.randint(0, 255, (BS, 64, 96, 3)).astype(np.uint8),
        "patch_hw": np.tile([[cfg.grid_h, cfg.grid_w]], (BS, 1)).astype(np.int32),
        "labels": rng.randint(0, 3, (BS,)).astype(np.int32),
    }
    path = str(tmp_path_factory.mktemp("art") / "snli-ve.climbx")
    export_eval_step(
        eval_step, model.params, batch, path,
        {
            "task_key": "snli-ve", "batch_size": BS, "model_type": "classification",
            "num_images": 1, "num_choices": 0, "tokenizer": "synthetic",
            "max_text_len": int(cfg.max_text_len), "image_height": 64,
            "image_width": 96, "patch_size": int(cfg.patch_size),
        },
        platforms=("cpu",),
    )
    return path, cfg


@pytest.fixture(scope="module")
def server(artifact):
    path, _ = artifact
    srv = create_server(path, port=0, max_wait_ms=300.0,
                        tokenizer=HashTokenizer())
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.service.close()


def _url(server, route):
    host, port = server.server_address[:2]
    return f"http://{host}:{port}{route}"


def _post(server, payload, route="/v1/predict"):
    req = urllib.request.Request(
        _url(server, route), data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=180) as r:
        return r.status, json.loads(r.read())


def _instances(n, seed=0):
    rng = np.random.RandomState(seed)
    return [
        {"text": f"a photo of thing number {i}",
         "image": rng.randint(0, 255, (40, 56, 3)).astype(np.uint8).tolist()}
        for i in range(n)
    ]


def _direct_logits(artifact, instances):
    """Ground truth: same preprocessing, direct ExportedModel call."""
    from climb_tpu.serve import ExportedModel

    path, cfg = artifact
    m = ExportedModel(path)
    proc = ViltInputProcessor(HashTokenizer(), cfg.max_text_len, (64, 96),
                              cfg.patch_size)
    out = []
    for r in instances:
        b = proc([r["text"]], [np.asarray(r["image"], np.uint8)])
        full = {}
        for k, (shape, dtype) in m.batch_spec.items():
            full[k] = np.zeros(tuple(shape), dtype)
            if k in b:
                full[k][:1] = b[k].astype(dtype)
        logits, _, _ = m(full)
        out.append(np.asarray(logits)[0])
    return out


def test_healthz_and_single_prediction(server, artifact):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=60) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    assert health["task_key"] == "snli-ve"
    assert health["batch_size"] == BS
    assert "pixel_values" in health["signature"]

    inst = _instances(1)
    status, out = _post(server, {"instances": inst, "return_logits": True})
    assert status == 200
    assert out["n"] == 1 and len(out["predictions"]) == 1
    want = _direct_logits(artifact, inst)[0]
    np.testing.assert_allclose(np.asarray(out["logits"][0]),
                               np.asarray(want, np.float64), rtol=0, atol=0)
    assert out["predictions"][0] == int(np.argmax(want))


def test_multi_instance_request_spans_batches(server, artifact):
    inst = _instances(BS + 2, seed=1)  # forces at least two device batches
    status, out = _post(server, {"instances": inst, "return_logits": True})
    assert status == 200
    assert out["n"] == BS + 2
    want = _direct_logits(artifact, inst)
    for got, exp in zip(out["logits"], want):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp, np.float64),
                                   rtol=0, atol=0)


def test_concurrent_requests_coalesce(artifact):
    # dedicated server with a coalescing window (3s) far wider than any
    # thread-start/preprocess skew this 1-core VM can produce
    path, _ = artifact
    srv = create_server(path, port=0, max_wait_ms=3000.0,
                        tokenizer=HashTokenizer(), warmup=False)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        results = [None] * BS

        def call(i):
            results[i] = _post(srv, {"instances": _instances(1, seed=10 + i)})

        threads = [threading.Thread(target=call, args=(i,)) for i in range(BS)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert all(r[0] == 200 for r in results)
        with srv.service.batcher._lock:
            stats = dict(srv.service.batcher.stats)
        assert stats["batched_examples"] == BS
        # 4 one-example requests land in fewer than 4 device batches
        assert stats["batches"] < BS
    finally:
        srv.shutdown()
        srv.service.close()


def test_error_responses(server):
    # malformed body -> 400 with a message
    status = None
    try:
        _post(server, {"instances": []})
    except urllib.error.HTTPError as e:
        status, body = e.code, json.loads(e.read())
    assert status == 400 and "instances" in body["error"]

    try:
        _post(server, {"instances": [{"text": "no image"}]})
    except urllib.error.HTTPError as e:
        status, body = e.code, json.loads(e.read())
    assert status == 400 and "missing" in body["error"]

    try:
        _post(server, {"instances": _instances(1)}, route="/nope")
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404


def test_batcher_overload_and_abandonment():
    """A full queue rejects fast (503 semantics) instead of growing
    unboundedly, and rows whose submitter timed out never reach the device."""
    import time as _time

    from climb_tpu.serve.server import OverloadedError

    ran = []
    gate = threading.Event()

    def slow_run(batch):
        gate.wait(10.0)
        ran.append(int(np.asarray(batch["valid"]).sum()))
        return (np.zeros((2, 3), np.float32),)

    spec = {"x": ((2, 3), "float32"), "valid": ((2,), "float32")}
    b = RequestBatcher(slow_run, spec, max_wait_ms=1.0,
                       submit_timeout_s=0.2, max_queued_batches=1)
    try:
        # the worker grabs the first row immediately and blocks on `gate`;
        # 2 more rows fill the bounded queue (maxsize = 1 batch = 2)
        t0 = threading.Thread(
            target=lambda: pytest.raises(TimeoutError, b.submit,
                                         {"x": np.zeros(3, np.float32)}))
        t0.start()
        _time.sleep(0.05)
        fillers = []
        for _ in range(2):
            th = threading.Thread(
                target=lambda: pytest.raises(TimeoutError, b.submit,
                                             {"x": np.zeros(3, np.float32)}))
            th.start()
            fillers.append(th)
        _time.sleep(0.1)
        with pytest.raises(OverloadedError, match="queue full"):
            b.submit({"x": np.zeros(3, np.float32)})
        t0.join()
        for th in fillers:
            th.join()
        # all submitters have timed out; release the worker — the queued
        # (abandoned) rows must be dropped, not executed
        gate.set()
        _time.sleep(0.3)
        with b._lock:
            stats = dict(b.stats)
        assert stats["rejected"] >= 1
        assert stats["abandoned"] >= 2  # timing may reject rather than
        # abandon one filler on a very slow host
        # only the first row (grabbed before abandonment) may have run
        assert stats["batched_examples"] <= 1
    finally:
        gate.set()
        b.close()


def test_unreadable_image_is_a_client_error(server):
    status = None
    try:
        _post(server, {"instances": [
            {"text": "hi", "image": "/no/such/file.jpg"}]})
    except urllib.error.HTTPError as e:
        status, body = e.code, json.loads(e.read())
    assert status == 400 and "unreadable image" in body["error"]

    try:
        _post(server, {"instances": [
            {"text": "hi", "image": {"b64": "bm90IGFuIGltYWdl"}}]})
    except urllib.error.HTTPError as e:
        status, body = e.code, json.loads(e.read())
    assert status == 400 and "unreadable image" in body["error"]


def test_batcher_zero_fills_signature_and_validates_rows():
    calls = []

    def run_fn(batch):
        calls.append({k: np.array(v) for k, v in batch.items()})
        return (np.arange(8, dtype=np.float32).reshape(4, 2),)

    spec = {
        "x": ((4, 3), "float32"),
        "labels": ((4,), "int32"),
        "valid": ((4,), "float32"),
    }
    b = RequestBatcher(run_fn, spec, max_wait_ms=50.0)
    try:
        row = b.submit({"x": np.ones((3,), np.float32)})
        assert row.shape == (2,)
        sent = calls[0]
        np.testing.assert_array_equal(sent["valid"], [1, 0, 0, 0])
        np.testing.assert_array_equal(sent["labels"], np.zeros(4, np.int32))
        np.testing.assert_array_equal(sent["x"][0], np.ones(3))
        np.testing.assert_array_equal(sent["x"][1:], np.zeros((3, 3)))
        with pytest.raises(ValueError, match="signature"):
            b.submit({"x": np.ones((5,), np.float32)})
    finally:
        b.close()


def test_serve_cli_sigterm_drains(artifact):
    """`python -m climb_tpu.cli.serve` must exit cleanly on SIGTERM after
    finishing in-flight work (k8s/systemd stop semantics): send a request,
    SIGTERM the process, assert a 0 exit and the drain log line."""
    import os
    import signal
    import subprocess
    import sys
    import time

    path, _ = artifact
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no remote-TPU auto-register
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, "-m", "climb_tpu.cli.serve",
         "--from_export", path, "--port", "0", "--tokenizer", "synthetic"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        # wait for the ready line (carries the ephemeral port)
        port = None
        deadline = time.time() + 120
        lines = []
        while time.time() < deadline:
            line = proc.stdout.readline()
            lines.append(line)
            if "ready: POST" in line:
                port = int(line.rsplit(":", 1)[-1].split("/")[0])
                break
        assert port, "server never became ready:\n" + "".join(lines)

        rng = np.random.RandomState(0)
        inst = {"text": "hello", "image": rng.randint(0, 255, (48, 64, 3)).tolist()}
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/predict",
            data=json.dumps({"instances": [inst]}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.loads(r.read())["n"] == 1

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
        assert proc.returncode == 0, out
        assert "draining" in out + "".join(lines)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()


def test_multi_task_server(tmp_path, artifact):
    """One server, several task artifacts: requests route by 'task', logits
    match each artifact's direct call, taskless requests on a multi-task
    server 4xx actionably, /healthz lists the tasks."""
    import jax

    # second artifact: a VQA head from the same CL family (soft-target task,
    # different head width) under its own task_key
    args = tiny_args(ordered_cl_tasks=["snli-ve", "vqa"])
    model = create_cl_model(args, task_configs)
    cfg = model.cfg
    eval_step = make_eval_step(
        model.module, "vqa", LOSS_TYPES["vqa"], cfg.compute_dtype
    )
    rng = np.random.RandomState(1)
    n_vqa = task_configs["vqa"]["num_labels"]
    batch = {
        "input_ids": rng.randint(1, cfg.vocab_size, (BS, cfg.max_text_len)).astype(np.int32),
        "text_mask": np.ones((BS, cfg.max_text_len), np.float32),
        "pixel_values": rng.randint(0, 255, (BS, 64, 96, 3)).astype(np.uint8),
        "patch_hw": np.tile([[cfg.grid_h, cfg.grid_w]], (BS, 1)).astype(np.int32),
        "target_scores": np.zeros((BS, n_vqa), np.float32),
    }
    vqa_path = str(tmp_path / "vqa.climbx")
    export_eval_step(
        eval_step, model.params, batch, vqa_path,
        {
            "task_key": "vqa", "batch_size": BS, "model_type": "classification",
            "num_images": 1, "num_choices": 0, "tokenizer": "synthetic",
            "max_text_len": int(cfg.max_text_len), "image_height": 64,
            "image_width": 96, "patch_size": int(cfg.patch_size),
        },
        platforms=("cpu",),
    )

    snli_path, snli_cfg = artifact
    srv = create_server([snli_path, vqa_path], port=0, max_wait_ms=100.0,
                        tokenizer=HashTokenizer())
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(_url(srv, "/healthz"), timeout=60) as r:
            health = json.loads(r.read())
        assert health["tasks"] == ["snli-ve", "vqa"]

        inst = _instances(2)
        # routed to snli-ve: matches the snli artifact's direct logits
        status, out = _post(srv, {"instances": inst, "task": "snli-ve",
                                  "return_logits": True})
        assert status == 200 and out["task_key"] == "snli-ve"
        want = _direct_logits((snli_path, snli_cfg), inst)
        for got, exp in zip(out["logits"], want):
            np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-4, atol=1e-5)

        # routed to vqa: a (n_vqa)-wide head answers
        status, out = _post(srv, {"instances": inst, "task": "vqa",
                                  "return_logits": True})
        assert status == 200 and out["task_key"] == "vqa"
        assert len(out["logits"][0]) == n_vqa

        # taskless request on a multi-task server: actionable 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, {"instances": inst})
        assert ei.value.code == 400
        assert "task" in json.loads(ei.value.read())["error"]

        # unknown task: actionable 400
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(srv, {"instances": inst, "task": "nope"})
        assert ei.value.code == 400

        # per-task stats
        with urllib.request.urlopen(_url(srv, "/stats"), timeout=60) as r:
            stats = json.loads(r.read())
        assert set(stats) == {"snli-ve", "vqa"}
        assert stats["vqa"]["examples"] >= 2
    finally:
        srv.shutdown()
        srv.server_close()
        for svc in srv.services.values():
            svc.close()


# ---- hardening: payload fuzz + per-request backpressure --------------------

FUZZ_PAYLOADS = [
    b"",                                        # empty body
    b"not json at all {{{",                     # broken JSON
    b"[1, 2, 3]",                               # JSON but not an object
    b'"just a string"',
    b"null",
    b'{"instances": "not-a-list"}',
    b'{"instances": [42]}',                     # non-object instance
    b'{"instances": ["text"]}',
    b'{"instances": [null]}',
    b'{"instances": [{}]}',                     # object missing every field
    b'{"instances": [{"text": 17, "image": 3}]}',
    b'{"instances": [{"text": "x", "image": {"b64": "!!!notbase64"}}]}',
    b'{"instances": [{"text": "x", "image": {"b64": ""}}]}',
    b'{"instances": [{"text": "x", "image": [[[1]]], "extra": {"a": [1]}}]}',
    b'{"instances": [{"choices": [], "image": [[[1]]]}]}',
    b'{"instances": [{"text": "' + b"x" * 100000 + b'", "image": 1}]}',
    b'{"task": {"nested": true}, "instances": [{"text": "x"}]}',
]


@pytest.mark.parametrize("payload", FUZZ_PAYLOADS,
                         ids=range(len(FUZZ_PAYLOADS)))
def test_malformed_payload_fuzz(server, payload):
    """Every malformed body must produce a 4xx JSON error — never a 5xx,
    never a hung/broken server."""
    req = urllib.request.Request(
        _url(server, "/v1/predict"), data=payload,
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            pytest.fail(f"malformed payload accepted: {r.status}")
    except urllib.error.HTTPError as e:
        body = json.loads(e.read())
        assert 400 <= e.code < 500, (e.code, body)
        assert isinstance(body.get("error"), str) and body["error"]


def test_server_survives_fuzz_then_serves(server, artifact):
    """After the fuzz barrage the server still answers a valid request."""
    status, body = _post(server, {"instances": _instances(1)})
    assert status == 200 and body["n"] == 1


def test_instances_per_request_bound(server):
    """A request above MAX_INSTANCES is rejected 413 BEFORE preprocessing:
    per-request backpressure so one client can't flood host memory (the
    batcher's bounded example queue only engages after preprocess)."""
    big = [{"text": "x", "image": 1}] * 2000  # > default 1024, never decoded
    try:
        _post(server, {"instances": big})
        pytest.fail("oversized request accepted")
    except urllib.error.HTTPError as e:
        body = json.loads(e.read())
        assert e.code == 413
        assert "per-request limit" in body["error"]


def test_max_instances_override(artifact):
    path, _ = artifact
    srv = create_server(path, port=0, max_wait_ms=50.0,
                        tokenizer=HashTokenizer(), max_instances=2)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        try:
            _post(srv, {"instances": _instances(3)})
            pytest.fail("3 instances accepted with max_instances=2")
        except urllib.error.HTTPError as e:
            assert e.code == 413
        status, body = _post(srv, {"instances": _instances(2)})
        assert status == 200 and body["n"] == 2
    finally:
        srv.shutdown()
        srv.service.close()
