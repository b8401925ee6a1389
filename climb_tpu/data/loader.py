"""Fixed-shape host data loader with background prefetch.

Replaces torch ``DataLoader`` (num_workers=2 in the reference,
SURVEY.md section 3.1) with a thread-pool loader producing numpy batch dicts
of *static shapes* (last partial batch padded + 'valid' mask), prefetched a
few batches ahead so the device never waits on the host.

Two worker modes:
- ``"thread"`` (default): a ThreadPoolExecutor. The heavy per-example work
  (libjpeg decode, C++ resample, np ops) releases the GIL, so threads
  parallelize well and batches need no serialization.
- ``"process"``: a fork()-based multiprocessing pool for pipelines whose
  Python-side work is GIL-bound (pure-Python tokenization fallbacks, heavy
  dict building). The dataset is inherited by fork — nothing is pickled
  except the index arrays in and the collated numpy batches out. Falls back
  to threads where fork is unavailable. Caveat: fork()ing after JAX has
  started its runtime threads is only safe because worker children never
  touch JAX — datasets/collates are numpy-only by design; keep it that way.
"""

import logging
import multiprocessing
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

# State inherited by fork()ed pool workers; guarded by _FORK_LOCK while a
# pool is being constructed (workers fork eagerly at Pool() creation, so the
# global only needs to be stable until the constructor returns).
_FORK_STATE = None
_FORK_LOCK = threading.Lock()


def _process_worker_ping():
    return True


def _try_create_fork_pool(state, num_workers, deadline=10.0):
    """Create a fork Pool with a deadline, or return None.

    fork()ing a process that already runs XLA/JAX worker threads can wedge
    either side on a lock some thread held at fork time — observed both in
    the Pool constructor and in fresh children. Construction + a ping run on
    a disposable daemon thread; if the deadline passes, the caller degrades
    to thread workers (a leaked wedged thread/child is bounded damage, a
    silent epoch-long hang is not)."""
    if not _FORK_LOCK.acquire(timeout=deadline):
        return None
    result = {}

    def build():
        global _FORK_STATE
        pool = None
        try:
            _FORK_STATE = state
            pool = multiprocessing.get_context("fork").Pool(num_workers)
            pool.apply_async(_process_worker_ping).get(timeout=deadline)
            result["pool"] = pool
        except Exception:
            if pool is not None:
                threading.Thread(target=pool.terminate, daemon=True).start()

    t = threading.Thread(target=build, daemon=True)
    t.start()
    t.join(deadline * 2)
    _FORK_LOCK.release()
    return result.get("pool")


def _process_worker_make_batch(task):
    dataset, collate_fn, batch_size = _FORK_STATE
    indices, bucket_w, text_len = task
    examples = [dataset[int(i)] for i in indices]
    examples = crop_examples_to_bucket(examples, bucket_w)
    examples = crop_examples_to_text_len(examples, text_len)
    return pad_batch(collate_fn(examples), batch_size)


def crop_examples_to_bucket(examples, bucket_w, patch_size: int = 32):
    """Crop each example's pixel canvas to `bucket_w` columns.

    The canvas is top-left anchored, so dropping columns beyond every
    example's valid patch width is lossless (those pixels are padding and
    their patches are masked out of attention). Safety: if any example needs
    more width than the bucket predicted (e.g. a corrupt image replaced by a
    full-size black canvas), widen to the needed multiple of patch_size
    instead of cutting valid pixels — the batch simply compiles at a less
    common shape.
    """
    if bucket_w is None:
        return examples
    needed = 0
    for ex in examples:
        needed = max(needed, int(np.max(np.asarray(ex["patch_hw"])[..., 1])) * patch_size)
    w = max(bucket_w, needed)
    out = []
    for ex in examples:
        pv = np.asarray(ex["pixel_values"])
        if pv.shape[-2] > w:
            ex = dict(ex)
            ex["pixel_values"] = np.ascontiguousarray(pv[..., :w, :])
        out.append(ex)
    return out


TEXT_KEYS = ("input_ids", "text_mask", "token_type_ids")


def crop_examples_to_text_len(examples, text_len):
    """Slice each example's text arrays to `text_len` tokens (last axis).

    Text is right-padded and padding tokens are masked out of attention, so
    dropping them is lossless (the model slices its position table by the
    traced length). Safety mirrors the canvas crop: if any example's real
    token count exceeds the bucket prediction, widen to the needed multiple
    of 8 instead of cutting live tokens.
    """
    if text_len is None:
        return examples
    needed = 0
    for ex in examples:
        mask = np.asarray(ex["text_mask"])
        needed = max(needed, int(mask.sum(axis=-1).max()))
    needed = -(-needed // 8) * 8  # round up to a multiple of 8
    full = int(np.asarray(examples[0]["input_ids"]).shape[-1])
    L = min(max(text_len, needed), full)
    if L == full:
        return examples
    out = []
    for ex in examples:
        ex = dict(ex)
        for k in TEXT_KEYS:
            if k in ex:
                ex[k] = np.ascontiguousarray(np.asarray(ex[k])[..., :L])
        out.append(ex)
    return out


def parse_text_buckets(value, max_text_len: int = 40):
    """Normalize a --text_buckets value: None, 'auto', 'l1,l2,...', or a
    sequence of ints -> ascending tuple of token lengths capped at
    max_text_len (or None). 'auto' = {16, 24, max_text_len}."""
    if value is None:
        return None
    if isinstance(value, str):
        if value.strip() == "auto":
            lens = {l for l in (16, 24) if l < max_text_len}
            return tuple(sorted(lens | {max_text_len}))
        lens = tuple(int(l) for l in value.split(",") if l.strip())
    else:
        lens = tuple(int(l) for l in value)
    if not lens:
        return None
    return tuple(sorted({min(l, max_text_len) for l in lens} | {max_text_len}))


def parse_bucket_widths(value, canvas_width: int = 640, patch_size: int = 32):
    """Normalize an --aspect_buckets value: None, 'auto', 'w1,w2,...', or a
    sequence of ints -> tuple of widths (or None). 'auto' = half /
    three-quarter / full canvas width, patch-aligned."""
    if value is None:
        return None
    if isinstance(value, str):
        if value.strip() == "auto":
            p = patch_size
            return tuple(sorted({max(p, canvas_width // 2 // p * p),
                                 max(p, 3 * canvas_width // 4 // p * p),
                                 canvas_width}))
        return tuple(int(w) for w in value.split(",") if w.strip()) or None
    return tuple(int(w) for w in value) or None


def pad_batch(batch: dict, target_bs: int) -> dict:
    """Pad every leaf's leading dim to target_bs; add/extend 'valid' mask."""
    actual = len(batch["valid"]) if "valid" in batch else None
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        n = v.shape[0]
        if actual is None:
            actual = n
        if n < target_bs:
            pad_width = [(0, target_bs - n)] + [(0, 0)] * (v.ndim - 1)
            v = np.pad(v, pad_width)
        out[k] = v
    if "valid" not in out:
        valid = np.zeros((target_bs,), np.float32)
        valid[:actual] = 1.0
        out["valid"] = valid
    return out


class DataLoader:
    """Iterable over fixed-shape collated batches.

    dataset: indexable with __len__/__getitem__ -> example dict
    collate_fn: list[example] -> batch dict (numpy)
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate_fn: Callable,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        num_workers: int = 4,
        prefetch: int = 2,
        epoch: int = 0,
        host_id: Optional[int] = None,
        host_count: Optional[int] = None,
        worker_mode: str = "thread",
        bucket_widths: Optional[Sequence[int]] = None,
        text_bucket_lens: Optional[Sequence[int]] = None,
    ):
        """host_id/host_count: per-host sharding for multi-host meshes — each
        host iterates a disjoint stripe of the (seed+epoch-shuffled) index
        stream, so a multi-host data-parallel job feeds distinct examples per
        host (the TPU-native replacement for distributed samplers,
        SURVEY.md section 5.8). Defaults to the JAX process topology.

        bucket_widths: aspect-bucketing canvas widths (pixels, ascending,
        e.g. (384, 512, 640)). Each batch then holds only examples whose
        valid image width fits one bucket, and its pixel canvas is cropped
        to that width — 4:3 photos (the COCO/Flickr majority) run at 512
        wide = 48 fewer padding patches per image than the 640 canvas, a
        measured step-time win (docs/PERF.md). Requires the dataset to
        expose ``canvas_widths()`` (per-example needed width in pixels);
        without it bucketing is disabled with a warning. Batch order stays
        deterministic in (seed, epoch), so resume/skip semantics hold.

        text_bucket_lens: text-length bucketing (token counts, ascending,
        e.g. (16, 24, 40)) — the sequence-axis analog of aspect bucketing.
        Each batch then holds only examples whose real token count fits one
        bucket and its text arrays are sliced to that length; typical VQA/
        SNLI-VE texts (10-15 tokens) stop paying for the 40-token pad.
        Requires the dataset to expose ``text_lengths()`` (per-example token
        counts); composes freely with bucket_widths (buckets are the cross
        product, batches stay homogeneous in both)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.epoch = epoch
        self.skip = 0
        self._len_cache = (None, 0)  # (epoch, bucketed batch count)
        assert worker_mode in ("thread", "process"), worker_mode
        if worker_mode == "process" and "fork" not in multiprocessing.get_all_start_methods():
            worker_mode = "thread"
        self.worker_mode = worker_mode
        if host_count is None:
            try:
                import jax

                host_id = jax.process_index()
                host_count = jax.process_count()
            except Exception:
                host_id, host_count = 0, 1
        self.host_id = host_id or 0
        self.host_count = max(1, host_count)

        # Each bucketing dimension maps every example to the smallest bucket
        # that fits it; wider/longer-than-largest clamps to the largest bucket
        # (crops are safety-checked at batch build time and widen rather than
        # cut valid data). Combined buckets are the cross product.
        self.bucket_widths, self._bucket_ids = self._setup_buckets(
            bucket_widths, "canvas_widths", "aspect bucketing"
        )
        self.text_bucket_lens, self._text_bucket_ids = self._setup_buckets(
            text_bucket_lens, "text_lengths", "text-length bucketing"
        )

    def _setup_buckets(self, bounds, hint_attr: str, what: str):
        if not bounds:
            return None, None
        bounds = tuple(sorted(int(b) for b in bounds))
        get_hint = getattr(self.dataset, hint_attr, None)
        need = None
        if get_hint is not None:
            try:
                need = np.asarray(get_hint())
            except (AttributeError, NotImplementedError):
                need = None
        if need is None:
            logger.warning(
                "%s requested but %s provides no %s(); running unbucketed",
                what, type(self.dataset).__name__, hint_attr,
            )
            return None, None
        ids = np.searchsorted(
            np.asarray(bounds), np.minimum(need, bounds[-1])
        ).astype(np.int64)
        return bounds, ids

    def __len__(self):
        if self.bucket_widths is not None or self.text_bucket_lens is not None:
            # per-epoch batch count varies with drop_last=False (trailing
            # per-bucket partials depend on the shuffle); cache per epoch —
            # the walk is O(dataset) index math
            if self._len_cache[0] != self.epoch:
                self._len_cache = (self.epoch, len(self._index_batches()))
            return self._len_cache[1]
        n = len(self.dataset)
        if self.host_count > 1:
            n = len(range(self.host_id, n, self.host_count))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def is_bucketed(self) -> bool:
        return self.bucket_widths is not None or self.text_bucket_lens is not None

    def example_order(self) -> "np.ndarray":
        """Dataset indices in the order this epoch's batches emit them
        (valid rows only — padding is excluded). Bucketing permutes the
        stream relative to dataset order; consumers that must align
        per-example outputs with dataset order (predict) invert this."""
        return np.concatenate(
            [inds for inds, _, _ in self._index_batches()]
        ) if len(self.dataset) else np.zeros((0,), np.int64)

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def set_skip(self, n_batches: int):
        """Skip the first n batches of the NEXT iteration only — index-level,
        so skipped examples are never loaded. Used by mid-epoch preemption
        resume: shuffling is deterministic in (seed, epoch), so skipping the
        already-consumed prefix reproduces the remaining batch stream."""
        self.skip = int(n_batches)

    def _index_batches(self) -> Sequence[tuple]:
        """Deterministic (indices, bucket_width, text_len) batch list for
        this epoch."""
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.host_count > 1:
            idx = idx[self.host_id :: self.host_count]
            n = len(idx)
        if self.bucket_widths is None and self.text_bucket_lens is None:
            stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
            return [
                (idx[i : i + self.batch_size], None, None)
                for i in range(0, stop, self.batch_size)
                if i < stop
            ]
        # Walk the shuffled stream accumulating per-bucket; a batch is emitted
        # at the stream position where its bucket fills, so ordering is as
        # close to the unbucketed shuffle as homogeneity allows and fully
        # deterministic in (seed, epoch) — resume/skip replays exactly.
        def key(i):
            wb = 0 if self._bucket_ids is None else int(self._bucket_ids[i])
            tb = 0 if self._text_bucket_ids is None else int(self._text_bucket_ids[i])
            return wb, tb

        def bounds(k):
            wb, tb = k
            w = None if self.bucket_widths is None else self.bucket_widths[wb]
            t = None if self.text_bucket_lens is None else self.text_bucket_lens[tb]
            return w, t

        pending = {}
        batches = []
        for i in idx:
            k = key(i)
            pending.setdefault(k, []).append(i)
            if len(pending[k]) == self.batch_size:
                batches.append((np.asarray(pending[k]),) + bounds(k))
                pending[k] = []
        if not self.drop_last:
            for k in sorted(pending):
                if pending[k]:
                    batches.append((np.asarray(pending[k]),) + bounds(k))
        return batches

    def _make_batch(self, task) -> dict:
        indices, bucket_w, text_len = task
        examples = [self.dataset[int(i)] for i in indices]
        examples = crop_examples_to_bucket(examples, bucket_w)
        examples = crop_examples_to_text_len(examples, text_len)
        batch = self.collate_fn(examples)
        return pad_batch(batch, self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        batches = self._index_batches()
        if self.skip:
            batches = batches[self.skip:]
            self.skip = 0
        if not batches:
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop_evt = threading.Event()

        def producer():
            # Bounded readahead: at most num_workers + prefetch batches are
            # in flight, so a slow consumer throttles the workers instead of
            # the whole epoch accumulating in RAM.
            from collections import deque

            inflight = deque()
            it = iter(batches)

            mode = self.worker_mode
            if mode == "process":
                pool = _try_create_fork_pool(
                    (self.dataset, self.collate_fn, self.batch_size),
                    self.num_workers,
                )
                if pool is None:
                    logger.warning(
                        "fork worker pool failed to come up (fork-after-"
                        "threads deadlock?); falling back to thread workers"
                    )
                    mode = "thread"
            if mode == "process":
                submit = lambda b: pool.apply_async(_process_worker_make_batch, (b,))
                fetch = lambda f: f.get()
            else:
                pool = ThreadPoolExecutor(self.num_workers)
                submit = lambda b: pool.submit(self._make_batch, b)
                fetch = lambda f: f.result()

            def top_up():
                while len(inflight) < self.num_workers + self.prefetch:
                    try:
                        inflight.append(submit(next(it)))
                    except StopIteration:
                        return

            err = None
            try:
                top_up()
                while inflight and not stop_evt.is_set():
                    q.put(fetch(inflight.popleft()))
                    top_up()
            except BaseException as e:  # worker failure: propagate, never hang
                err = e
            finally:
                if mode == "process":
                    # terminate on a daemon thread: joining a pool whose
                    # handler threads are wedged must not hang the epoch
                    threading.Thread(target=pool.terminate, daemon=True).start()
                else:
                    pool.shutdown(wait=False, cancel_futures=True)
                # end-of-stream sentinel (or the worker's exception) — must be
                # delivered even on failure or the consumer blocks forever.
                # A full queue does NOT mean the consumer is gone: it may be
                # stalled for minutes (first-step JIT compile, replay step),
                # so retry until delivered and abandon only once the consumer
                # has signalled exit via stop_evt.
                sentinel = ("__done__", err)
                while True:
                    try:
                        q.put(sentinel, timeout=1)
                        break
                    except queue.Full:
                        if stop_evt.is_set():
                            break

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, tuple) and len(item) == 2 and item[0] == "__done__":
                    if item[1] is not None:
                        raise item[1]
                    break
                yield item
        finally:
            stop_evt.set()
            # drain so the producer can exit
            while t.is_alive():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def device_prefetch(batch_iter, put_fn, size: int = 2):
    """Overlap host->device transfer with device compute: keep `size` batches
    already transferred ahead of the consumer. `put_fn` maps a host batch to
    device arrays (device_put / shard_batch). JAX transfers are async, so
    enqueueing ahead is enough to hide PCIe/ICI latency behind the step."""
    import collections

    queue = collections.deque()
    for batch in batch_iter:
        queue.append(put_fn(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def collate_from_indices(dataset, indices: Sequence[int], collate_fn: Callable, batch_size: Optional[int] = None) -> dict:
    """Build one fixed-shape batch from explicit dataset indices (used by the
    experience-replay buffer, reference experience_replay.py:53-67)."""
    examples = [dataset[int(i)] for i in indices]
    batch = collate_fn(examples)
    return pad_batch(batch, batch_size or len(examples))
