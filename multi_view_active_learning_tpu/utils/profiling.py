"""Profiling and step timing.

The reference has no tracing at all — only manual GPU-memory logging
(strategy.py:533-542; SURVEY.md §5).  Here:

  * `trace(log_dir)` wraps jax.profiler for full XLA/TPU traces viewable in
    TensorBoard or Perfetto;
  * `StepTimer` keeps an online steps/sec + p50/p95 step-latency summary
    (device-synchronized when asked) for the metrics writer;
  * `device_memory_stats()` reports per-device HBM usage where the backend
    exposes it (TPU does; CPU returns {}).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 200):
        self.window = window
        self._durations: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._durations.append(now - self._last)
            if len(self._durations) > self.window:
                self._durations.pop(0)
        self._last = now

    def reset(self) -> None:
        self._durations.clear()
        self._last = None

    def summary(self) -> Dict[str, float]:
        if not self._durations:
            return {}
        d = np.asarray(self._durations)
        return {
            "steps_per_sec": 1.0 / float(d.mean()),
            "step_ms_p50": float(np.percentile(d, 50) * 1e3),
            "step_ms_p95": float(np.percentile(d, 95) * 1e3),
        }


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device memory stats in GiB (TPU backends expose memory_stats;
    replaces the reference's torch.cuda.memory_reserved logging)."""
    out: Dict[str, Dict[str, float]] = {}
    for dev in jax.local_devices():
        try:
            stats = dev.memory_stats()
        except Exception:
            stats = None
        if not stats:
            continue
        gib = 1024**3
        out[str(dev)] = {
            "bytes_in_use_gib": stats.get("bytes_in_use", 0) / gib,
            "peak_bytes_in_use_gib": stats.get("peak_bytes_in_use", 0) / gib,
            "bytes_limit_gib": stats.get("bytes_limit", 0) / gib,
        }
    return out
