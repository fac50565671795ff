"""Profiling helpers (SURVEY §5 tracing/obs: the reference has wall-clock
timing only; here we expose jax.profiler traces and a simple scope timer)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ScopeTimer:
    """Wall-clock scope timer with device sync (the role of the reference's
    paddle_package.py timer, 7-62)."""

    def __init__(self, name: str = ""):
        self.name = name
        self.elapsed = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        # best-effort sync; see utils/benchmark.py for transport caveats
        try:
            jax.effects_barrier()
        except Exception:
            pass
        self.elapsed = time.perf_counter() - self._t0
        return False
