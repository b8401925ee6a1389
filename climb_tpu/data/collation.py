"""Batch collation (parity: reference per-task ``*_batch_collate`` +
``image_collate``, src/data/image_collation.py:29-63).

Because every dataset already emits fixed-shape numpy examples (AOT
tokenization + canvas images), collation is a single stack — the reference's
per-task dynamic padding collates are unnecessary by construction.
"""

import numpy as np


def stack_collate(examples):
    out = {}
    for k in examples[0]:
        first = np.asarray(examples[0][k])
        # preallocate + assign instead of np.stack: np.stack's
        # expand_dims+concatenate path degrades badly for batches of
        # image-sized arrays under CPU/memory pressure (measured up to 100x
        # slower than direct assignment in the same process)
        batch = np.empty((len(examples),) + first.shape, first.dtype)
        batch[0] = first
        for i in range(1, len(examples)):
            batch[i] = examples[i][k]
        out[k] = batch
    return out
