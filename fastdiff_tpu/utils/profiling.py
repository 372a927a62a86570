"""Tracing/profiling helpers (SURVEY §5.1 — the reference has only a
cuda-synchronized Timer; utils/__init__.py:243-264).

- ``trace(dir)``: context manager around ``jax.profiler`` producing an xplane
  trace viewable in TensorBoard's profile plugin or xprof.
- ``RTFMeter``: accumulates generation-time / audio-time over utterances with
  ``block_until_ready`` fencing — the working version of the reference's
  dead ``compute_rtf`` helper (modules/FastDiff/task/FastDiff.py:127-132).
- ``device_timer``: wall-clock a jitted callable with proper device fencing.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RTFMeter:
    def __init__(self, sample_rate: int = 22050):
        self.sample_rate = sample_rate
        self.gen_seconds = 0.0
        self.audio_seconds = 0.0
        self.count = 0

    @contextlib.contextmanager
    def measure(self, audio_samples: int):
        t0 = time.perf_counter()
        yield
        self.gen_seconds += time.perf_counter() - t0
        self.audio_seconds += audio_samples / self.sample_rate
        self.count += 1

    @property
    def rtf(self) -> float:
        return self.gen_seconds / max(self.audio_seconds, 1e-9)

    @property
    def x_realtime(self) -> float:
        return self.audio_seconds / max(self.gen_seconds, 1e-9)

    def summary(self) -> str:
        return (f"RTF={self.rtf:.4f} ({self.x_realtime:.1f}x realtime, "
                f"{self.count} utterances, {self.audio_seconds:.1f}s audio)")


def device_timer(fn: Callable, *args, iters: int = 10, warmup: int = 1):
    """Median wall-clock of ``fn(*args)`` in ms with device fencing."""
    import numpy as np
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1000.0)
