"""Tracing / profiling hooks.

The reference's only observability is wandb gradient histograms and tqdm
bars (SURVEY.md §5.1).  TPU-native replacements:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the wrapped region;
* :class:`StepTimer` — lightweight wall-clock step timing with p50/p90
  summaries (host side, no device sync beyond what the caller does);
* :func:`device_memory_stats` — per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, name: str = "step"):
        self.name = name
        self.durations: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.durations.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {}
        arr = np.asarray(self.durations)
        return {
            f"{self.name}_p50_s": float(np.percentile(arr, 50)),
            f"{self.name}_p90_s": float(np.percentile(arr, 90)),
            f"{self.name}_mean_s": float(arr.mean()),
            f"{self.name}_count": len(arr),
        }


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    import jax

    out = {}
    for dev in jax.local_devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            out[str(dev)] = {
                "bytes_in_use": stats.get("bytes_in_use", 0),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use", 0),
                "bytes_limit": stats.get("bytes_limit", 0),
            }
    return out
