"""Preemption-safe training: SIGTERM -> checkpoint -> clean exit.

TPU pods (and most managed clusters) deliver SIGTERM with a short grace
window before killing the process. The reference loses all progress since
its last epoch-cadence save (reference train.py:1279-1288 — nothing
handles signals); here a guard converts the signal into a synchronous
checkpoint at the next step boundary and a clean return, so `--checkpoint`
resume (train/checkpoint.py) restarts the interrupted epoch.

The handler itself only sets a flag — everything slow (device sync,
serialization) happens on the main thread at a step boundary, never
inside the signal context.
"""

from __future__ import annotations

import logging
import signal
import threading

logger = logging.getLogger(__name__)


class PreemptionGuard:
    """Context manager that latches listed signals into a flag.

    Usage:
        with PreemptionGuard() as guard:
            for step in ...:
                ...
                if guard.triggered:
                    save(); break

    Installs handlers only from the main thread (signal module
    restriction); elsewhere it degrades to a never-triggered flag. A
    second signal while the flag is already set falls through to the
    previous handler (default: kill) — the escape hatch if the save
    itself wedges."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._event = threading.Event()
        self._previous = {}

    @property
    def triggered(self) -> bool:
        return self._event.is_set()

    def _handle(self, signum, frame):
        if self._event.is_set():
            prev = self._previous.get(signum)
            if callable(prev):
                return prev(signum, frame)
            # SIG_DFL for SIGTERM: terminate now.
            signal.signal(signum, signal.SIG_DFL)
            return signal.raise_signal(signum)
        logger.warning(
            "received signal %d: will checkpoint and exit at the next "
            "step boundary (send again to terminate immediately)", signum
        )
        self._event.set()

    def install(self) -> "PreemptionGuard":
        if threading.current_thread() is threading.main_thread():
            for s in self._signals:
                self._previous[s] = signal.signal(s, self._handle)
        return self

    def uninstall(self) -> None:
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        self._previous.clear()

    def __enter__(self) -> "PreemptionGuard":
        return self.install()

    def __exit__(self, *exc):
        self.uninstall()
        return False
