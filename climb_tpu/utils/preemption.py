"""Graceful-preemption support (beyond-reference capability).

TPU pools and schedulers deliver SIGTERM with a short grace window before
eviction. When elastic checkpointing is enabled, the trainer polls
``preemption_requested()`` at every step boundary and, on a pending signal,
saves the FULL train state (params + optimizer moments + rng + loader
position) and exits with status 143 — the next invocation of the same
command resumes mid-epoch with a bit-identical trajectory
(tests/test_preemption.py).

The handler only sets a flag: all checkpoint I/O happens on the main thread
at a step boundary, never inside the signal handler.
"""

import logging
import signal
import threading

logger = logging.getLogger(__name__)

_FLAG = threading.Event()
_INSTALLED = False


def install_preemption_handler(signals=(signal.SIGTERM,)) -> bool:
    """Install (idempotently) flag-setting handlers. Returns False when not
    running in the main thread (signal module restriction)."""
    global _INSTALLED
    if _INSTALLED:
        return True

    def _handler(signum, frame):
        logger.warning("Received signal %d: will checkpoint and exit at the "
                       "next step boundary", signum)
        _FLAG.set()

    try:
        for s in signals:
            signal.signal(s, _handler)
    except ValueError:  # not in main thread
        return False
    _INSTALLED = True
    return True


def preemption_requested() -> bool:
    return _FLAG.is_set()


def request_preemption():
    """Programmatic trigger (tests, cooperative shutdown)."""
    _FLAG.set()


def clear_preemption():
    _FLAG.clear()
