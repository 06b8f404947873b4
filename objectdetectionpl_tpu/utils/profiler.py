"""Profiler hooks: jax.profiler traces viewable in TensorBoard.

TPU-native upgrade of the reference's GPUStatsMonitor callback (run.py:107):
instead of polling utilization, capture real XLA execution traces.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Context manager wrapping a region in a profiler trace."""
    import jax
    if not enabled:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Per-device memory stats (the GPUStatsMonitor analogue)."""
    import jax
    out = {}
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[str(d)] = {k: stats.get(k) for k in
                           ("bytes_in_use", "peak_bytes_in_use",
                            "bytes_limit") if k in stats}
    return out
