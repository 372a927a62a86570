"""Tracing/profiling helpers (SURVEY §5.1 — the reference has only a
cuda-synchronized Timer; utils/__init__.py:243-264).

- ``trace(dir)``: context manager around ``jax.profiler`` producing an xplane
  trace viewable in TensorBoard's profile plugin or xprof.
- ``force``: TRUSTWORTHY completion fence. In this development environment
  the TPU sits behind a network relay whose ``block_until_ready`` can ACK
  before device execution finishes (observed: pipelined timings implying
  >peak FLOP/s). The only sound fence is fetching real bytes that
  data-depend on the computation: ``force`` reduces the output to a scalar
  ON DEVICE and fetches 4 bytes. Device execution is in-order, so forcing
  the last value of a pipelined loop fences every call before it.
- ``RTFMeter``: accumulates generation-time / audio-time over utterances —
  the working version of the reference's dead ``compute_rtf`` helper
  (modules/FastDiff/task/FastDiff.py:127-132). Use with ``force``.
- ``device_timer``: wall-clock a jitted callable with forced completion.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp

_reduce = None


def force(value) -> float:
    """Force real device completion of ``value`` (and, by in-order stream
    semantics, everything dispatched before it). Returns the fetched scalar
    so callers can also use it as a cheap finiteness probe."""
    global _reduce
    if _reduce is None:
        _reduce = jax.jit(lambda v: jnp.sum(jnp.asarray(v, jnp.float32)))
    leaves = [x for x in jax.tree_util.tree_leaves(value)
              if hasattr(x, "dtype")]
    if not leaves:
        return 0.0
    return float(_reduce(leaves[-1].ravel()[-1:]))


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


def device_timer(fn: Callable, *args, iters: int = 10, warmup: int = 1,
                 pipeline: int = 1):
    """Median wall-clock of ``fn(*args)`` in ms with forced completion.

    ``pipeline`` > 1 dispatches that many calls per timed sample and forces
    only the last one, amortizing the relay's fetch round-trip (~10-25 ms
    here) across the batch; device in-order execution makes the average
    exact up to one RTT / pipeline. For sub-ms kernels that residual bias
    dominates — use ``device_timer_slope`` instead.
    """
    import numpy as np
    for _ in range(warmup):
        force(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = None
        for _i in range(pipeline):
            out = fn(*args)
        force(out)
        times.append((time.perf_counter() - t0) / pipeline)
    return float(np.median(times) * 1000.0)


def timed_pipeline(fn: Callable, *args, n: int) -> float:
    """Wall-clock seconds for n pipelined calls + ONE forced fetch."""
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    force(out)
    return time.perf_counter() - t0


def device_timer_slope(fn: Callable, *args, n1: int = 10, n2: int = 50,
                       reps: int = 3, warmup: int = 2) -> float:
    """Per-call device time in ms, with the constant fetch RTT CANCELLED.

    A pipelined loop of n calls + one forced fetch costs n*t + RTT; with
    today's relay RTT (~10-30 ms) the +RTT/n bias of ``device_timer``
    swamps sub-ms kernels. Timing two loop sizes and taking the slope
    (T2-T1)/(n2-n1) removes every per-measurement constant (fetch RTT,
    dispatch tail). Returns the min slope over ``reps`` rep pairs (min is
    the right statistic for contention noise: slowdowns are one-sided).
    """
    for _ in range(warmup):
        force(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t1 = timed_pipeline(fn, *args, n=n1)
        t2 = timed_pipeline(fn, *args, n=n2)
        best = min(best, (t2 - t1) / (n2 - n1))
    return best * 1000.0
