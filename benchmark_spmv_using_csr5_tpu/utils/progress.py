"""Liveness heartbeat hook for long-running host phases.

The round bench (bench.py) watches the case-runner child with a per-case
inactivity watchdog because the TPU tunnel occasionally hangs processes
outright (NOTES.md). Multi-hundred-second host work — large-matrix
conversion, golden-model SpMV, device uploads — is silent on stdout and
is therefore indistinguishable from a hang (this killed banded20M twice
in BENCH_r02). Long phases call :func:`emit` at every milestone; the
case runner installs a sink that prints one flushed JSON heartbeat line
per event, which resets the parent's watchdog without being mistaken for
a case result (the parent skips lines carrying an ``hb`` key).

The default sink is a no-op, so library use stays silent.
"""

from __future__ import annotations

import contextlib
from typing import Callable, Optional

_sink: Optional[Callable[[str], None]] = None


def set_sink(sink: Optional[Callable[[str], None]]) -> None:
    """Install (or clear, with None) the process-wide heartbeat sink."""
    global _sink
    _sink = sink


def emit(phase: str) -> None:
    """Report liveness at a phase milestone (no-op without a sink)."""
    if _sink is not None:
        _sink(phase)


@contextlib.contextmanager
def phase(name: str):
    """Emit ``name`` on entry and ``name:done`` on exit."""
    emit(name)
    try:
        yield
    finally:
        emit(name + ":done")
