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
        out[k] = np.stack([np.asarray(e[k]) for e in examples])
    return out
