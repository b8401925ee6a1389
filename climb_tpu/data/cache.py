"""Pickle caches for parsed annotations and loader hints.

The reference pickles parsed annotations next to the data
(e.g. vqa_dataset.py:72-130); this module is the one shared implementation
for those caches plus the loader-side hint caches (text lengths, image
header dims). Writes are tmp+rename atomic so a process killed mid-write
never leaves a truncated cache; loads tolerate a missing file (returns
None) but propagate corrupt-content errors for annotation caches — callers
that prefer silent rebuild pass ``tolerant=True``."""

import os
import pickle


def load_pickle_cache(path, tolerant: bool = False):
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        if tolerant:
            return None
        raise


def save_pickle_cache(path, data):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    try:
        with open(tmp, "wb") as f:
            pickle.dump(data, f)
        os.replace(tmp, path)
    except OSError:
        try:
            os.remove(tmp)
        except OSError:
            pass
