"""Host input-pipeline cost model: can the host FEED the device headline?

The reference's defining performance defect is an input-bound pipeline (its
per-step host preprocessing inside model.forward, reference
``src/modeling/vilt.py:83-96``, caps it at O(100) ex/s regardless of
accelerator). This framework moved all of that work to AOT C++ host ops +
on-device normalize — this module PROVES the resulting pipeline sustains the
measured device throughput, with numbers, instead of asserting it.

Methodology (the one CLAUDE.md documents for this dev VM): measure each host
op per example IN ISOLATION with the production implementations —

- ``process_jpeg_file``: C++ libjpeg decode + C++ PIL-exact bicubic resample
  into the canvas (compute-bound; this VM's CPU core is representative).
- tokenize: C++ WordPiece over a realistic ~30k-entry vocab trie.
- collate + pad: pure memcpy of fixed-shape rows into the batch
  (``stack_collate``). Memcpy is BANDWIDTH-bound, and this dev VM's ~20 MB/s
  host memory (CLAUDE.md) is 2-3 orders of magnitude below any production
  TPU host's, so the model prices memcpy from its exact byte count and the
  host's measured bandwidth rather than this VM's wall clock. Both readings
  are reported (``raw`` = this host's wall clock, ``normalized`` = byte-count
  / reference-host bandwidth).

Cost model: loader workers are threads and every hot op above releases the
GIL in C++ (``worker_mode=thread``), so W workers sustain approximately
``W / per_example_seconds`` examples/sec. The committed artifact
(HOST_FEED_r03.json) records the constants; tests/test_host_feed.py asserts
``workers x (1/per_example_cost) > headline`` with them.
"""

import io
import json
import os
import time
from typing import Optional, Tuple

import numpy as np

# Conservative effective per-core memcpy bandwidth for a production TPU-VM
# host (Cloud TPU hosts measure tens of GB/s STREAM; 5 GB/s/core leaves a
# wide margin for NUMA effects and sharing).
REFERENCE_HOST_BW_BYTES_PER_S = 5e9


def make_test_jpeg(h: int = 375, w: int = 500, quality: int = 85) -> bytes:
    """A natural-image-like JPEG at the typical COCO source size (smooth
    gradients + mild texture — white noise would be a pathological,
    unrepresentatively slow decode)."""
    from PIL import Image

    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 80 * np.sin(yy / 37.0) + 40 * np.cos(xx / 23.0)
    tex = np.random.RandomState(0).randn(h, w) * 8
    ch0 = np.clip(base + tex, 0, 255).astype(np.uint8)
    rgb = np.stack([ch0, np.roll(ch0, 7, axis=0), np.roll(ch0, 13, axis=1)],
                   axis=-1)
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, "JPEG", quality=quality)
    return buf.getvalue()


def make_wordpiece_vocab(path: str, n_words: int = 28000) -> str:
    """A realistic-size WordPiece vocab (trie-lookup cost scales with vocab):
    specials + synthetic word/##suffix entries."""
    rng = np.random.RandomState(0)
    letters = "abcdefghijklmnopqrstuvwxyz"
    entries = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    seen = set(entries)
    while len(entries) < n_words:
        n = rng.randint(2, 10)
        word = "".join(letters[i] for i in rng.randint(0, 26, n))
        if rng.rand() < 0.3:
            word = "##" + word
        if word not in seen:
            seen.add(word)
            entries.append(word)
    with open(path, "w") as f:
        f.write("\n".join(entries))
    return path


def _best_rate(fn, n_per_call: int, iters: int = 5) -> float:
    """Best-of-iters seconds per ITEM for fn() processing n_per_call items."""
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best / n_per_call


def measure_memory_bandwidth(nbytes: int = 64 << 20, iters: int = 3) -> float:
    """This host's large-copy bandwidth (bytes/s) — the normalizer for the
    memcpy-bound collate cost."""
    src = np.ones(nbytes, np.uint8)
    dst = np.empty_like(src)
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.copyto(dst, src)
        best = min(best, time.perf_counter() - t0)
    return nbytes / best


def measure_host_costs(
    canvas_hw: Tuple[int, int] = (384, 640),
    text_len: int = 40,
    batch: int = 64,
    iters: int = 5,
    tmpdir: Optional[str] = None,
    bw_nbytes: int = 64 << 20,
) -> dict:
    """Per-example isolated costs (seconds) of every host-path op, using the
    production implementations. Returns the measurement dict consumed by
    :func:`cost_model`."""
    import tempfile

    from climb_tpu.data.collation import stack_collate
    from climb_tpu.data.image_pipeline import process_jpeg_file
    from climb_tpu.native import native_available

    own_tmp = tmpdir is None
    tmpdir = tmpdir or tempfile.mkdtemp(prefix="host_cost_")
    out = {"native": native_available(), "canvas_hw": list(canvas_hw),
           "text_len": text_len, "batch": batch}

    # 1. JPEG -> canvas (C++ decode + C++ bicubic into the canvas)
    jpg_path = os.path.join(tmpdir, "cost.jpg")
    with open(jpg_path, "wb") as f:
        f.write(make_test_jpeg())
    res = process_jpeg_file(jpg_path, canvas_hw)
    if res is not None:
        out["jpeg_to_canvas_s"] = _best_rate(
            lambda: [process_jpeg_file(jpg_path, canvas_hw) for _ in range(8)],
            8, iters,
        )
        out["jpeg_to_canvas_impl"] = "native"
    else:  # PIL fallback path (native libs not built)
        from climb_tpu.data.image_pipeline import process_image
        from PIL import Image

        # re-open per call: a reused Image object caches its decoded raster
        # after the first load, which would time resize-only and understate
        # the per-example cost the loader actually pays
        out["jpeg_to_canvas_s"] = _best_rate(
            lambda: [process_image(Image.open(jpg_path), canvas_hw)
                     for _ in range(8)],
            8, iters,
        )
        out["jpeg_to_canvas_impl"] = "pil-fallback"

    # 2. tokenize (production tokenizer over a realistic vocab)
    from climb_tpu.data.tokenization import load_tokenizer

    vocab = make_wordpiece_vocab(os.path.join(tmpdir, "vocab.txt"))
    tok = load_tokenizer(vocab)
    texts = [
        "a person riding a horse on the beach near the blue water today"
    ] * 64
    out["tokenize_s"] = _best_rate(
        lambda: [tok.encode(t, text_len) for t in texts], len(texts), iters
    )
    out["tokenize_impl"] = type(tok).__name__

    # 3. collate: memcpy of fixed-shape rows into the batch. Priced two ways:
    #    raw wall clock here, and byte-count / bandwidth (the portable form).
    ch, cw = canvas_hw
    example = {
        "pixel_values": np.zeros((ch, cw, 3), np.uint8),
        "input_ids": np.zeros((text_len,), np.int32),
        "text_mask": np.ones((text_len,), np.float32),
        "patch_hw": np.array([12, 20], np.int32),
        "labels": np.zeros((), np.int32),
    }
    examples = [dict(example) for _ in range(batch)]
    out["collate_s_raw"] = _best_rate(
        lambda: stack_collate(examples), batch, iters
    )
    out["bytes_per_example"] = int(
        sum(np.asarray(v).nbytes for v in example.values())
    )
    out["host_bw_bytes_per_s"] = measure_memory_bandwidth(bw_nbytes)
    if own_tmp:
        import shutil

        shutil.rmtree(tmpdir, ignore_errors=True)
    return out


def cost_model(
    measured: dict,
    headline_ex_s: float,
    workers: int,
    host_bw_bytes_per_s: float = REFERENCE_HOST_BW_BYTES_PER_S,
) -> dict:
    """Does a ``workers``-core host sustain ``headline_ex_s``?

    Compute-bound ops (decode/resample/tokenize) use their measured wall
    clock; the memcpy-bound collate is priced as bytes/bandwidth for the
    TARGET host (pass this host's measured bandwidth to model *this* host).
    """
    collate_s = measured["bytes_per_example"] / host_bw_bytes_per_s
    per_example_s = (
        measured["jpeg_to_canvas_s"] + measured["tokenize_s"] + collate_s
    )
    sustained = workers / per_example_s
    return {
        "per_example_ms": {
            "jpeg_to_canvas": round(measured["jpeg_to_canvas_s"] * 1e3, 4),
            "tokenize": round(measured["tokenize_s"] * 1e3, 4),
            "collate_at_bw": round(collate_s * 1e3, 4),
            "total": round(per_example_s * 1e3, 4),
        },
        "host_bw_assumed_gb_s": host_bw_bytes_per_s / 1e9,
        "workers": workers,
        "sustained_ex_s": round(sustained, 1),
        "headline_ex_s": headline_ex_s,
        "workers_needed_for_headline": int(
            np.ceil(headline_ex_s * per_example_s)
        ),
        "sustains_headline": bool(sustained > headline_ex_s),
        "margin_x": round(sustained / headline_ex_s, 2),
    }


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--headline", type=float, default=873.3,
                    help="device step ex/s the host must feed (BENCH r02)")
    ap.add_argument("--workers", type=int, default=16,
                    help="loader worker threads on the modeled host")
    ap.add_argument("--out", default=None, help="write JSON here")
    flags = ap.parse_args(argv)

    measured = measure_host_costs()
    report = {
        "what": "host input-pipeline cost model: per-example isolated op "
                "costs (production C++ host path) + sustained-feed bound",
        "measured": measured,
        "model_reference_host": cost_model(measured, flags.headline,
                                           flags.workers),
        "model_this_host": cost_model(
            measured, flags.headline, flags.workers,
            host_bw_bytes_per_s=measured["host_bw_bytes_per_s"],
        ),
        "vm_caveat": "collate wall clock on this dev VM is bandwidth-bound "
                     "(CLAUDE.md: ~20 MB/s host memory); the reference-host "
                     "model prices memcpy from exact byte counts at "
                     f"{REFERENCE_HOST_BW_BYTES_PER_S / 1e9:.0f} GB/s.",
    }
    text = json.dumps(report, indent=1)
    print(text)
    if flags.out:
        with open(flags.out, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
