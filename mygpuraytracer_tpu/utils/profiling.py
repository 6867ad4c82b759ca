"""Profiling / tracing helpers.

TPU equivalents of the reference's instrumentation (SURVEY.md §5): the
cudaEvent GPU timer around the bounce loop (apps/src/timer.h), OIDN's phase
timers, and the VTune ITT pause/resume hooks (oidnDenoise.cpp:11-13) map to
jax.profiler traces (xprof-compatible) plus named scopes and synchronized
phase timers.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mygpurt_trace"):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """Annotate a region of traced computation (shows up in XLA HLO and
    profiler timelines)."""
    return jax.named_scope(name)


class PhaseTimer:
    """Accumulating per-phase wall timers with device sync — the equivalent
    of the reference's deviceInit/filterInit/denoise phase prints
    (main.cpp:184-218)."""

    def __init__(self):
        self.phases: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            ms = (time.perf_counter() - t0) * 1000
            self.phases[name] = self.phases.get(name, 0.0) + ms
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name, total in self.phases.items():
            n = self.counts[name]
            lines.append(f"{name}: {total:.1f} ms total, {total / n:.2f} ms/call ({n}x)")
        return "\n".join(lines)
