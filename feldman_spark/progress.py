"""Progress-listener surface mirroring the reference's
``feldman.py:28-39`` (``setProgressListener`` / ``reportProgress``).

The reference reports per-row progress because it iterates rows in
Python; a Spark plan executes whole stages, so the natural milestones
are pipeline phases, not rows. The listener protocol is kept identical
— an object with ``clear()`` and ``setValueAndText(value, text)`` — so
a GUI/driver written against the reference's listener works unchanged.
Percentages are coarse phase boundaries; for per-task granularity at
cluster scale, attach a ``SparkListener`` to the session instead (the
stage/task stream is the distributed analogue of row counts).
"""

from __future__ import annotations

from typing import Optional, Protocol

__all__ = ["ProgressListener", "set_progress_listener", "report_progress"]


class ProgressListener(Protocol):
    def clear(self) -> None: ...

    def setValueAndText(self, value: float, text: str) -> None: ...


_listener: Optional[ProgressListener] = None


def set_progress_listener(pl: Optional[ProgressListener]) -> None:
    """Install (or clear, with ``None``) the process-wide listener —
    the twin of ``feldman.setProgressListener`` (feldman.py:30-33)."""
    global _listener
    _listener = pl
    if pl is not None:
        pl.clear()


def report_progress(value: float, text: str) -> None:
    """Forward a (percent, message) milestone to the listener if one is
    installed — the twin of ``feldman.reportProgress`` (feldman.py:36-39)."""
    if _listener is not None:
        _listener.setValueAndText(value, text)
