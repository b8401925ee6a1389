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
# stack of {signal: previous_handler} maps, one entry per active install —
# handlers are SCOPED to a train loop (install at entry, uninstall in a
# finally), never left behind process-wide: a leaked flag-only handler would
# make the host process silently un-terminable by SIGTERM after the loop
# ends (observed: a pytest run that had exercised a trainer in-process
# outlived its `timeout ...` wrapper because the wrapper's SIGTERM only set
# this flag, which nothing was polling anymore).
_PREV = []


def install_preemption_handler(signals=(signal.SIGTERM,)) -> bool:
    """Install flag-setting handlers, saving the previous ones for
    ``uninstall_preemption_handler``. Returns False when not running in the
    main thread (signal module restriction). Nested installs stack."""

    def _handler(signum, frame):
        logger.warning("Received signal %d: will checkpoint and exit at the "
                       "next step boundary", signum)
        _FLAG.set()

    saved = {s: signal.getsignal(s) for s in signals}
    try:
        for s in signals:
            signal.signal(s, _handler)
    except ValueError:  # not in main thread
        return False
    _PREV.append(saved)
    return True


def uninstall_preemption_handler() -> None:
    """Restore the handlers saved by the matching install. When the last
    scope exits, also clear a pending (un-acted-on) flag so a later train
    loop in the same process doesn't phantom-preempt on its first step."""
    if _PREV:
        for s, h in _PREV.pop().items():
            try:
                signal.signal(s, h)
            except ValueError:
                pass
    if not _PREV:
        _FLAG.clear()


def preemption_requested() -> bool:
    return _FLAG.is_set()


def request_preemption():
    """Programmatic trigger (tests, cooperative shutdown)."""
    _FLAG.set()


def clear_preemption():
    _FLAG.clear()
