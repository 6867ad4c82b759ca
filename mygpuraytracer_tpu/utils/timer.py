"""Phase timers.

TPU-native replacement for the reference's cudaEvent-based PerformanceTimer
(apps/src/timer.h:17-101) and OIDN's chrono Timer (common/timer.h:11-35).
On TPU there is no event API at this level; instead we synchronize with
``jax.block_until_ready`` around the timed region.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax


class PerformanceTimer:
    """Accumulating wall-clock timer with explicit device sync.

    Mirrors the start/end/elapsed surface of apps/src/timer.h and the
    cumulative ``totalTime`` bookkeeping of apps/src/main.cpp:263-264,275.
    """

    def __init__(self) -> None:
        self._start: float | None = None
        self._last_ms: float = 0.0
        self.total_ms: float = 0.0
        self.count: int = 0

    def start(self) -> None:
        if self._start is not None:
            raise RuntimeError("timer already started")
        self._start = time.perf_counter()

    def end(self, sync: object = None) -> float:
        """Stop the timer. If ``sync`` is a jax array/pytree, block on it first."""
        if self._start is None:
            raise RuntimeError("timer not started")
        if sync is not None:
            jax.block_until_ready(sync)
        self._last_ms = (time.perf_counter() - self._start) * 1000.0
        self.total_ms += self._last_ms
        self.count += 1
        self._start = None
        return self._last_ms

    @property
    def last_ms(self) -> float:
        return self._last_ms

    @contextmanager
    def timed(self, sync_fn=None):
        self.start()
        out = {}
        try:
            yield out
        finally:
            self.end(sync=out.get("sync"))


@contextmanager
def timed_ms(results: dict, key: str):
    """Time a block and store milliseconds into ``results[key]``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        results[key] = (time.perf_counter() - t0) * 1000.0
