"""Synthetic in-memory datasets for every task family.

The reference has no test suite and its real datasets are multi-GB downloads
(SURVEY.md section 4); these deterministic generators produce examples with
exactly the batch schema of the real pipelines, so trainers, CL algorithms,
drivers, and multi-chip sharding are testable hermetically.
"""

from typing import Optional, Tuple

import numpy as np


class SyntheticVLDataset:
    """Vision-language examples shaped per task.

    Emits the same keys as the real VQA/NLVR2/SNLI-VE/VCR pipelines:
      single-image cls:  input_ids (L,), text_mask, token_type_ids,
                         pixel_values (H,W,3) u8, patch_hw (2,), labels ()
      image-pair cls:    pixel_values (2,H,W,3), patch_hw (2,2)
      multi-choice:      input_ids (C,L), text_mask (C,L), token_type_ids (C,L)
      vqa:               target_scores (num_labels,) instead of labels
    """

    def __init__(
        self,
        size: int,
        num_labels: int,
        model_type: str = "classification",
        num_images: int = 1,
        num_choices: Optional[int] = None,
        text_len: int = 40,
        canvas_hw: Tuple[int, int] = (384, 640),
        patch_size: int = 32,
        soft_targets: bool = False,
        seed: int = 0,
        learnable: bool = True,
        label_noise: float = 0.0,
    ):
        self.size = size
        self.num_labels = num_labels
        self.model_type = model_type
        self.num_images = num_images
        self.num_choices = num_choices
        self.text_len = text_len
        self.canvas_hw = canvas_hw
        self.patch_size = patch_size
        self.soft_targets = soft_targets
        self.seed = seed
        self.learnable = learnable
        # Per-example int labels fixed up front so low-shot class subsampling
        # and replay behave like the real datasets.
        rng = np.random.RandomState(seed)
        n_classes = num_choices if model_type == "multi-choice" else num_labels
        self.labels = rng.randint(0, max(n_classes, 1), size=(size,))
        # Difficulty knob: with probability ``label_noise`` an example's
        # learnable SIGNAL (marker token / image stamp / multi-choice marker
        # placement) encodes a random OTHER class while the training target
        # keeps the true label. A signal-following predictor is wrong on
        # exactly the flipped examples, so the Bayes-optimal dev accuracy is
        # 1-p instead of 100.0 — at p=0.3 every task ceilings at 70, so
        # forgetting/transfer matrices are non-degenerate and CL algorithms
        # can actually separate (round-4 verdict item 2: at p=0 every task
        # saturates at 100.0 by epoch 2 and sequential_ft, ER, and EWC are
        # indistinguishable).
        self.label_noise = float(label_noise)
        self.signal_labels = self.labels.copy()
        if self.label_noise > 0 and n_classes > 1:
            nrng = np.random.RandomState(seed * 31337 + 7)
            flip = nrng.random_sample(size) < self.label_noise
            # draw a wrong class uniformly: shift by 1..C-1 mod C
            shift = nrng.randint(1, n_classes, size=size)
            self.signal_labels = np.where(
                flip, (self.labels + shift) % n_classes, self.labels
            )
        # Generation is deterministic per index, so items are memoized after
        # first materialization: on the 1-core dev/smoke VM the ~40ms/example
        # canvas synthesis dominates multi-epoch driver runs otherwise
        # (CLAUDE.md host-bandwidth note). Consumers never mutate item arrays
        # (stack_collate copies into preallocated batches).
        self._cache = {}

    def __len__(self):
        return self.size

    def _patch_hws(self, i: int) -> np.ndarray:
        """Per-example valid patch dims, drawn from a rng stream independent
        of the example-content stream so ``canvas_widths()`` (aspect
        bucketing) can compute them without materializing images."""
        rng = np.random.RandomState(self.seed * 7919 + 1000003 + i)
        h, w = self.canvas_hw
        gh, gw = h // self.patch_size, w // self.patch_size
        return rng.randint(
            [1, 1], [gh + 1, gw + 1], size=(max(self.num_images, 1), 2)
        ).astype(np.int32)

    def canvas_widths(self) -> np.ndarray:
        """Needed canvas width (pixels) per example — the bucketing hint."""
        return np.array(
            [int(self._patch_hws(i)[:, 1].max()) * self.patch_size for i in range(self.size)],
            np.int64,
        )

    def _text_lens(self, i: int) -> np.ndarray:
        """Per-text token counts for example i, from a rng stream independent
        of the content stream so ``text_lengths()`` (text-length bucketing)
        needs no example materialization."""
        rng = np.random.RandomState(self.seed * 7919 + 2000003 + i)
        n = self.num_choices if self.model_type == "multi-choice" else 1
        return rng.randint(4, self.text_len, size=(n,))

    def text_lengths(self) -> np.ndarray:
        """Real token count per example — the text-bucketing hint."""
        return np.array(
            [int(self._text_lens(i).max()) for i in range(self.size)], np.int64
        )

    def _image(self, rng, label, patch_hw):
        h, w = self.canvas_hw
        # tile a small random texture instead of sampling every pixel —
        # ~20x cheaper per example with the same shapes/statistics
        tile = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
        img = np.tile(tile, ((h + 31) // 32, (w + 31) // 32, 1))[:h, :w]
        if self.learnable:
            # Stamp a label-dependent pattern in the top-left patch so a model
            # can actually fit the data (sanity for integration tests).
            img[:16, :16, :] = (label * 37) % 256
        return img, patch_hw

    def __getitem__(self, i: int) -> dict:
        hit = self._cache.get(i)
        if hit is not None:
            return dict(hit)
        rng = np.random.RandomState(self.seed * 100003 + i)
        label = int(self.labels[i])
        signal = int(self.signal_labels[i])  # == label unless noise flipped it
        L = self.text_len
        text_lens = iter(self._text_lens(i))

        def text(marker=None):
            n = int(next(text_lens))
            ids = np.zeros((L,), np.int32)
            ids[0] = 101
            ids[1:n] = rng.randint(1000, 2000, size=(n - 1,))
            if marker is not None:
                # learnable signal: a label-dependent token outside the random
                # content range [1000,2000), so a model can fit the data via an
                # embedding lookup (integration tests + hardware smoke runs
                # assert scores clear the random baseline). The marker repeats
                # at every other content position: from RANDOM init (zero
                # egress — smoke runs have no pretrained weights) a single
                # token among 40 is too weak for many-way discrimination in a
                # ~80-step task (r04 hardware VQA sat at ~5 for 10 epochs);
                # repetition makes the pooled representation strongly
                # label-dependent even through random layers, while the
                # label_noise knob still caps the Bayes ceiling.
                ids[1:n - 1:2] = marker
            ids[n - 1] = 102
            mask = np.zeros((L,), np.float32)
            mask[:n] = 1.0
            return ids, mask

        ex = {}
        if self.model_type == "multi-choice":
            nc = self.num_choices
            # the correct choice carries marker 999, the rest 998 — the
            # multi-choice analog of the label token (choice index itself is
            # not recoverable from a per-choice forward). Markers live BELOW
            # the random content range [1000,2000) so they fit the tiny test
            # models' 2048-token vocab: an out-of-vocab id silently becomes
            # NaN via jnp.take's OOB fill (caught as NaN trajectories in
            # test_mesh_training_equivalence with the old 2998/2999 ids).
            markers = [999 if c == signal else 998 for c in range(nc)] \
                if self.learnable else [None] * nc
            ids, masks = zip(*[text(m) for m in markers])
            ex["input_ids"] = np.stack(ids)
            ex["text_mask"] = np.stack(masks)
            ex["token_type_ids"] = np.zeros((nc, L), np.int32)
        else:
            # [103, 998): below the content range, above the special ids
            # (0 pad / 101 CLS / 102 SEP), within every model's vocab
            marker = 103 + (signal % 895) if self.learnable else None
            ids, mask = text(marker)
            ex["input_ids"] = ids
            ex["text_mask"] = mask
            ex["token_type_ids"] = np.zeros((L,), np.int32)

        phws = self._patch_hws(i)
        if self.num_images == 2:
            imgs, phws2 = zip(*[self._image(rng, signal, phws[j]) for j in range(2)])
            ex["pixel_values"] = np.stack(imgs)
            ex["patch_hw"] = np.stack(phws2)
        else:
            img, phw = self._image(rng, signal, phws[0])
            ex["pixel_values"] = img
            ex["patch_hw"] = phw

        if self.soft_targets:
            scores = np.zeros((self.num_labels,), np.float32)
            scores[label] = 1.0
            extra = rng.randint(0, self.num_labels)
            scores[extra] = max(scores[extra], 0.3)
            ex["target_scores"] = scores
        else:
            ex["labels"] = np.int32(label)
        self._cache[i] = ex
        return dict(ex)

    # -- low-shot transforms (parity: convert_to_low_shot in each reference
    #    dataset, e.g. vqa_dataset.py:173-187, nlvr2_dataset.py:118-134) -----
    def convert_to_low_shot(self, percentage: Optional[float] = None, num_shots_per_class: Optional[int] = None, seed: int = 0):
        rng = np.random.RandomState(seed)
        if percentage is not None:
            n = max(1, int(self.size * percentage))
            keep = rng.choice(self.size, size=n, replace=False)
        else:
            keep = []
            for c in np.unique(self.labels):
                idx = np.where(self.labels == c)[0]
                take = min(num_shots_per_class, len(idx))
                keep.extend(rng.choice(idx, size=take, replace=False))
            keep = np.asarray(keep)
        return SubsetDataset(self, np.sort(keep))


class SyntheticTextDataset:
    """Language-only synthetic examples (no images; the classifier broadcasts
    a shared mean-image canvas, reference vilt.py:437-441)."""

    def __init__(self, size, num_labels, model_type="classification",
                 num_choices=None, max_len=40, seed=0):
        self.size = size
        self.num_labels = num_labels
        self.model_type = model_type
        self.num_choices = num_choices
        self.max_len = max_len
        self.seed = seed
        rng = np.random.RandomState(seed)
        n_classes = num_choices if model_type == "multi-choice" else num_labels
        self.labels = rng.randint(0, max(n_classes, 1), size=(size,))

    def __len__(self):
        return self.size

    def _text(self, rng, marker):
        L = self.max_len
        n = rng.randint(4, L)
        ids = np.zeros((L,), np.int32)
        ids[0] = 101
        ids[2 : n - 1] = rng.randint(1010, 2000, size=(max(n - 3, 0),))
        # label-dependent token, repeated so the pooled representation is
        # strongly label-dependent even through randomly-initialized layers
        # (smoke runs have no pretrained weights)
        ids[1 : n - 1 : 2] = marker
        ids[n - 1] = 102
        mask = np.zeros((L,), np.float32)
        mask[:n] = 1.0
        return ids, mask

    def __getitem__(self, i):
        rng = np.random.RandomState(self.seed * 999983 + i)
        label = int(self.labels[i])
        if self.model_type == "multi-choice":
            # Per-choice markers (correct=999, wrong=998, the VL convention):
            # the per-choice forward scores each choice independently, so a
            # label-index token shared by every choice carries NO
            # discriminative signal — the pre-r05 scheme made multi-choice
            # language tasks unlearnable (PHASE2_RUN_r03 PIQA sat at chance).
            ids, masks = zip(*[self._text(rng, 999 if c == label else 998)
                               for c in range(self.num_choices)])
            return {
                "input_ids": np.stack(ids),
                "text_mask": np.stack(masks),
                "token_type_ids": np.zeros((self.num_choices, self.max_len), np.int32),
                "labels": np.int32(label),
            }
        ids, mask = self._text(rng, 103 + (label % 895))
        return {
            "input_ids": ids,
            "text_mask": mask,
            "token_type_ids": np.zeros((self.max_len,), np.int32),
            "labels": np.int32(label),
        }


class SubsetDataset:
    def __init__(self, base, indices):
        self.base = base
        self.indices = np.asarray(indices)
        self.labels = getattr(base, "labels", None)
        if self.labels is not None:
            self.labels = self.labels[self.indices]

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.base[int(self.indices[i])]

    def canvas_widths(self):
        return np.asarray(self.base.canvas_widths())[self.indices]

    def text_lengths(self):
        return np.asarray(self.base.text_lengths())[self.indices]


def make_synthetic_vl_dataset(task_key: str, task_cfg: dict, split: str, size: int, text_len: int = 40, canvas_hw=(384, 640), seed: int = 0, label_noise: float = 0.0):
    """Synthetic stand-in for a real VL task dataset, shaped by its config."""
    split_seed = {"train": 0, "val": 1, "dev": 1, "test": 2}.get(split, 3)
    return SyntheticVLDataset(
        size=size,
        num_labels=task_cfg["num_labels"],
        model_type=task_cfg["model_type"],
        num_images=task_cfg.get("num_images", 1),
        num_choices=task_cfg.get("num_choices"),
        text_len=text_len,
        canvas_hw=canvas_hw,
        soft_targets=(task_key == "vqa"),
        seed=seed * 17 + split_seed,
        label_noise=label_noise,
    )
