"""Seeding (parity: reference ``src/utils/seed_utils.py:5``).

The reference seeds python/numpy/torch. Here the host-side RNG surface is
python's ``random`` and numpy (used by the data pipeline for subsampling,
shuffling, and replay sampling); device-side randomness goes through explicit
``jax.random`` keys derived from the same seed, so a single integer seed
reproduces a full run.
"""

import random

import numpy as np


def set_seed(args_or_seed) -> int:
    """Seed host RNGs. Accepts an int or any object with a ``.seed`` attribute."""
    seed = getattr(args_or_seed, "seed", args_or_seed)
    seed = int(seed)
    random.seed(seed)
    np.random.seed(seed)
    return seed
