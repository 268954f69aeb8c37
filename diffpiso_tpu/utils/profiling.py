"""Profiling / observability utilities.

TPU-native equivalents of the reference's instrumentation:

  trace               <- Session.profiler() chrome tracing
                         (PhiFlow/phi/tf/profiling.py:9-38) — wraps
                         jax.profiler.trace, viewable in TensorBoard/Perfetto
  StepTimer           <- the per-step wall-clock measurement of
                         spatial_mixing_layer_differentiable_inference.py:126-132
  device_memory_stats <- tf.contrib.memory_stats.BytesInUse polling
                         (combined_training_integrated.py:92,188)
"""

from __future__ import annotations

import contextlib
import socket
import time
from typing import Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: `with trace('/tmp/trace'): run_steps()`."""
    with jax.profiler.trace(logdir):
        yield


def device_memory_stats(device=None) -> dict:
    d = device or jax.devices()[0]
    stats = d.memory_stats() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use", -1),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
        "bytes_limit": stats.get("bytes_limit", -1),
    }


class StepTimer:
    """Per-step wall-clock timing; save() writes performance_<hostname>.npz
    like the reference's inference script."""

    def __init__(self):
        self.times = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else float("nan")

    def save(self, directory: str):
        import os

        path = os.path.join(directory, f"performance_{socket.gethostname()}.npz")
        np.savez(path, np.asarray(self.times))
        return path
