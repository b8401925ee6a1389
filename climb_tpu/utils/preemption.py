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
    """Restore the handlers saved by the matching install.

    A pending un-acted-on flag deliberately SURVIVES uninstall: a SIGTERM
    that lands after the loop's last poll (e.g. during end-of-task eval or
    the best-param save) must not be silently dropped — the multi-task
    driver polls ``preemption_requested()`` between tasks and exits 143.
    Acted-on preemptions clear the flag at their exit point, so a later
    train loop in the same process never phantom-preempts.
    """
    if _PREV:
        for s, h in _PREV.pop().items():
            if h is None:
                # signal.getsignal returned None at install time: the prior
                # handler was installed from C and cannot be re-installed
                # from Python; SIG_DFL is the closest safe restoration.
                h = signal.SIG_DFL
            try:
                signal.signal(s, h)
            except (ValueError, TypeError, OSError):
                pass
    if not _PREV and _FLAG.is_set():
        logger.warning("Preemption was requested but not yet acted on; the "
                       "request stays pending for the caller to honor")


def preemption_requested() -> bool:
    return _FLAG.is_set()


def request_preemption():
    """Programmatic trigger (tests, cooperative shutdown)."""
    _FLAG.set()


def clear_preemption():
    _FLAG.clear()
