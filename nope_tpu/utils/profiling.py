"""Profiling / timing harness.

The reference has no tracing story (SURVEY §5: thop FLOP hooks and
wall-clock prints only).  Here: a ``jax.profiler`` trace context for
TensorBoard/Perfetto and a ``block_until_ready`` timing helper for
steady-state throughput measurement.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin
    or Perfetto (``xplane.pb``)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(
    fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs
) -> Dict[str, float]:
    """Steady-state timing: returns mean/min seconds per call (device
    work fenced with block_until_ready)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return {
        "mean_s": sum(times) / len(times),
        "min_s": min(times),
        "max_s": max(times),
        "iters": float(iters),
    }


def device_memory_stats() -> Dict[str, float]:
    """Per-device HBM usage when the backend exposes it."""
    stats = {}
    for d in jax.local_devices():
        try:
            ms = d.memory_stats()
            stats[str(d)] = {
                "bytes_in_use": ms.get("bytes_in_use", 0),
                "peak_bytes_in_use": ms.get("peak_bytes_in_use", 0),
            }
        except Exception:
            pass
    return stats
