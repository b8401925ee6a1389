"""Serving latency/throughput benchmark for climb-serve (run on the chip).

Builds a scratch ViLT artifact with a batch-size ladder, starts the HTTP
server on an ephemeral port, and measures what a deployment cares about:

  phase 1 — single-stream latency: sequential 1-instance requests; the
            batcher should route each to the smallest ladder program
            (p50/p90/p99 ms, per-request end-to-end incl. preprocessing).
  phase 2 — offered load: K client threads each firing R-instance requests
            back-to-back; reports examples/sec, achieved batch fill, p99.

One JSON line per phase. NOTE on this dev VM: request preprocessing (canvas
assembly) is host-bound by the ~20 MB/s host memory (CLAUDE.md) — the
device-side numbers (program ms, batch fill) transfer to real hosts, the
end-to-end ones are a floor.

Usage:
  python exp_scripts/bench_serving.py                # ViLT-base, TPU
  python exp_scripts/bench_serving.py --tiny         # tiny model (CPU ok)
"""

import argparse
import json
import os
import sys
import threading
import time
import urllib.request
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_artifact(args, path):
    from climb_tpu.configs import task_configs
    from climb_tpu.serve import export_eval_step
    from climb_tpu.train import LOSS_TYPES, create_cl_model
    from climb_tpu.train.train_step import make_eval_step

    h, w = (64, 96) if args.tiny else (384, 640)
    margs = SimpleNamespace(
        batch_size=args.batch, seed=0, synthetic=True, tiny=args.tiny,
        ordered_cl_tasks=["snli-ve"], encoder_name="vilt",
        pretrained_vilt_name="scratch", pretrained_model_name="scratch",
        image_height=h, image_width=w, compute_dtype="bfloat16",
    )
    model = create_cl_model(margs, task_configs)
    cfg = model.cfg
    eval_step = make_eval_step(
        model.module, "snli-ve", LOSS_TYPES["snli-ve"], cfg.compute_dtype
    )
    rng = np.random.RandomState(0)
    bs = args.batch
    batch = {
        "input_ids": rng.randint(1, cfg.vocab_size, (bs, cfg.max_text_len)).astype(np.int32),
        "text_mask": np.ones((bs, cfg.max_text_len), np.float32),
        "pixel_values": rng.randint(0, 255, (bs, h, w, 3)).astype(np.uint8),
        "patch_hw": np.tile([[cfg.grid_h, cfg.grid_w]], (bs, 1)).astype(np.int32),
        "labels": rng.randint(0, 3, (bs,)).astype(np.int32),
    }
    ladder = sorted({1, min(8, bs), bs})
    export_eval_step(
        eval_step, model.params, batch, path,
        {
            "task_key": "snli-ve", "batch_size": bs,
            "model_type": "classification", "num_images": 1,
            "num_choices": 0, "tokenizer": "synthetic",
            "max_text_len": int(cfg.max_text_len),
            "image_height": h, "image_width": w,
            "patch_size": int(cfg.patch_size),
        },
        batch_sizes=ladder,
    )
    return ladder


def post(base, payload, timeout=600):
    req = urllib.request.Request(
        base + "/v1/predict", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def get(base, route):
    with urllib.request.urlopen(base + route, timeout=60) as r:
        return json.loads(r.read())


def make_instances(n, hw, seed=0):
    rng = np.random.RandomState(seed)
    return [
        {"text": f"two people ride a very small bench number {i}",
         "image": rng.randint(0, 255, (hw[0], hw[1], 3)).astype(np.uint8).tolist()}
        for i in range(n)
    ]


def pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny model (CPU dev)")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--requests", type=int, default=40,
                    help="single-stream request count")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--per_request", type=int, default=4,
                    help="instances per request in the load phase")
    ap.add_argument("--load_requests", type=int, default=8,
                    help="requests per client thread in the load phase")
    ap.add_argument("--image_hw", type=str, default="96,128",
                    help="client image size (small: this 1-core VM is "
                         "host-bound on full-canvas JSON/memcpy)")
    args = ap.parse_args()

    if args.tiny:
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from climb_tpu.cli.common import enable_compilation_cache
    from climb_tpu.data.tokenization import HashTokenizer
    from climb_tpu.serve.server import create_server

    enable_compilation_cache()
    art = "/tmp/climb_bench_serving.climbx"
    t0 = time.perf_counter()
    ladder = build_artifact(args, art)
    print(f"# artifact (ladder {ladder}) built+exported in "
          f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    srv = create_server(art, port=0, max_wait_ms=3.0,
                        tokenizer=HashTokenizer())
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address[:2]
    base = f"http://{host}:{port}"
    hw = tuple(int(x) for x in args.image_hw.split(","))

    # phase 1: single-stream latency
    inst = make_instances(1, hw)
    post(base, {"instances": inst})  # session warm (programs pre-warmed too)
    lats = []
    for i in range(args.requests):
        t = time.perf_counter()
        post(base, {"instances": inst})
        lats.append((time.perf_counter() - t) * 1e3)
    stats = get(base, "/stats")
    print(json.dumps({
        "metric": "serve_single_stream_latency_ms",
        "p50": round(pct(lats, 50), 1), "p90": round(pct(lats, 90), 1),
        "p99": round(pct(lats, 99), 1),
        "n": len(lats), "last_batch_size": stats.get("last_batch_size"),
    }))

    # phase 2: offered load from concurrent clients
    errs, req_lats = [], []
    lock = threading.Lock()

    def client(tid):
        insts = make_instances(args.per_request, hw, seed=tid)
        for _ in range(args.load_requests):
            t = time.perf_counter()
            try:
                post(base, {"instances": insts})
            except Exception as e:  # noqa: BLE001
                with lock:
                    errs.append(repr(e))
                return
            with lock:
                req_lats.append((time.perf_counter() - t) * 1e3)

    before = get(base, "/stats")
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.threads)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    wall = time.perf_counter() - t0
    after = get(base, "/stats")
    n_ex = args.threads * args.load_requests * args.per_request - \
        len(errs) * args.per_request
    batches = max(after["batches"] - before["batches"], 1)
    fill = (after["batched_examples"] - before["batched_examples"]) / batches
    print(json.dumps({
        "metric": "serve_offered_load",
        "examples_per_sec": round(n_ex / wall, 1),
        "req_p50_ms": round(pct(req_lats, 50), 1) if req_lats else None,
        "req_p99_ms": round(pct(req_lats, 99), 1) if req_lats else None,
        "mean_batch_fill": round(fill, 2),
        "threads": args.threads, "errors": len(errs),
    }))
    if errs:
        print(f"# errors: {errs[:3]}", file=sys.stderr)
    srv.shutdown()
    srv.server_close()
    srv.service.close()


if __name__ == "__main__":
    main()
