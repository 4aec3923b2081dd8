"""Tracing / profiling as a first-class module.

The reference has none (SURVEY.md §5.1 — only tqdm bars and a thop FLOPs
hook). Here: `jax.profiler` trace capture around step ranges, a
low-overhead step timer with percentile summaries, and a device-memory
snapshot helper — all usable from the trainer or CLIs.

    with trace_steps("work_dir/profile", enabled=step in range(50, 55)):
        state, loss = train_step(state, batch)

    timer = StepTimer()
    with timer.step():
        ...
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

__all__ = ["StepTimer", "trace_steps", "device_memory_stats"]


class StepTimer:
    """Wall-clock step timer with p50/p90/p99 summaries."""

    def __init__(self, warmup: int = 2):
        self.durations: list[float] = []
        self.warmup = warmup
        self._count = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._count += 1
        if self._count > self.warmup:
            self.durations.append(dt)

    def summary(self) -> dict:
        if not self.durations:
            return {}
        d = np.asarray(self.durations)
        return {
            "steps": len(d),
            "mean_s": float(d.mean()),
            "p50_s": float(np.percentile(d, 50)),
            "p90_s": float(np.percentile(d, 90)),
            "p99_s": float(np.percentile(d, 99)),
            "steps_per_sec": float(1.0 / d.mean()),
        }


@contextlib.contextmanager
def trace_steps(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin format)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device HBM usage where the backend exposes it."""
    import jax
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
    return out
