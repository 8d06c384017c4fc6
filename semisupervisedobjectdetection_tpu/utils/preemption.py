"""Graceful-preemption handling for the training CLIs.

TPU VMs are routinely preempted: spot/preemptible capacity and host
maintenance events deliver SIGTERM with a short grace window before the
hard kill, and interactive runs die to Ctrl-C (SIGINT). The reference has
no preemption story at all — a killed run loses everything since its last
best-eval save and always restarts optimization at epoch 0
(`/root/reference/main_segformer/segFormer_main.py:79-86`; SURVEY.md §5
checkpoint row). Here the first signal flips a cooperative stop flag that
every training loop polls at batch boundaries; the loop breaks out of the
epoch, writes its `*_last` resume checkpoint (full state: params +
batch_stats + optimizer moments, `checkpoint/orbax_io.py::save_last`),
prints a restart hint and exits 0 so a supervisor can reschedule the job
with `--resume`. A second signal restores the previous disposition and
re-raises itself — the escape hatch if the checkpoint write wedges.

The flag lives at module level (not per-object) so training loops can poll
`stop_requested()` with zero plumbing, and tests can simulate a preemption
with `request_stop()` without installing any handler. Signal handlers can
only be installed from the main thread; `install()` degrades to a no-op
(returning False) elsewhere, so importing CLI mains from worker threads
stays safe.

Note on latency: CPython runs signal handlers between bytecodes, so a
signal landing inside a long blocking XLA compile/execute call is only
observed when that call returns — the stop is best-effort prompt, which is
why the loops poll per batch (the finest boundary where a consistent
checkpoint exists).
"""

from __future__ import annotations

import os
import signal
import threading

_STOP = threading.Event()
_INFO = {"signal": None, "signals_seen": 0}
_PREV: dict = {}


def _handler(signum, frame):
    # Escalation counts REAL signals only: a programmatic request_stop()
    # must not make the first actual SIGTERM take the hard-kill path and
    # skip the checkpoint save.
    _INFO["signals_seen"] += 1
    if _INFO["signals_seen"] > 1:
        # Second signal: restore the previous disposition and re-deliver,
        # so a wedged checkpoint write can still be killed. A SIG_IGN
        # previous disposition falls back to SIG_DFL — re-delivering an
        # ignored signal would make the escape hatch a permanent no-op.
        prev = _PREV.get(signum, signal.SIG_DFL)
        if prev in (signal.SIG_IGN, None):
            prev = signal.SIG_DFL
        try:
            signal.signal(signum, prev)
        except (TypeError, ValueError):
            signal.signal(signum, signal.SIG_DFL)
        os.kill(os.getpid(), signum)
        return
    _INFO["signal"] = signal.Signals(signum).name
    _STOP.set()
    # os.write is async-signal-safe; print() into the buffered stdout the
    # interrupted main thread may be mid-write in can raise
    # "RuntimeError: reentrant call" and crash the run before the save.
    os.write(1, (f"\n{_INFO['signal']} received: finishing the current "
                 "batch, checkpointing, then exiting cleanly — signal "
                 "again to kill immediately\n").encode())


def install(signals=(signal.SIGTERM, signal.SIGINT)) -> bool:
    """Install the graceful-stop handler (CLI `__main__` blocks only —
    in-process callers like tests keep their host's signal handling).
    Returns False (and installs nothing) off the main thread."""
    try:
        for s in signals:
            if s not in _PREV:
                _PREV[s] = signal.signal(s, _handler)
        return True
    except ValueError:  # not the main thread
        return False


def uninstall() -> None:
    """Restore the pre-install handlers and clear the stop flag (tests)."""
    while _PREV:
        s, prev = _PREV.popitem()
        try:
            signal.signal(s, prev)
        except (TypeError, ValueError):
            pass
    reset()


def reset() -> None:
    """Clear the stop flag (tests / multi-run drivers)."""
    _STOP.clear()
    _INFO["signal"] = None
    _INFO["signals_seen"] = 0


def stop_requested() -> bool:
    """True once a stop signal (or `request_stop`) arrived; training loops
    poll this at batch boundaries."""
    return _STOP.is_set()


def request_stop(name: str = "request") -> None:
    """Programmatic stop — same effect as the first signal (tests, or an
    embedding application draining a training worker)."""
    _INFO["signal"] = name
    _STOP.set()


def signal_name() -> str:
    """Name of the signal that requested the stop ('stop' if none)."""
    return _INFO["signal"] or "stop"
