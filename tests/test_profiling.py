"""Profiling helpers: forced-completion fence + slope timing."""

import time

import numpy as np

import jax.numpy as jnp

from fastdiff_tpu.utils.profiling import (RTFMeter, device_timer,
                                          device_timer_slope, force,
                                          timed_pipeline)


def test_force_returns_scalar_and_fences():
    out = force(jnp.arange(8.0))
    assert isinstance(out, float)
    assert np.isfinite(out)
    assert force({"a": jnp.ones((2, 2))}) == 1.0
    assert force([]) == 0.0


def test_slope_timer_cancels_constant_overhead(monkeypatch):
    """A fake op with per-call cost t plus a constant per-measurement fetch
    cost (the relay RTT): the plain pipelined timer is biased by
    +constant/n, the slope timer recovers t exactly. Uses a virtual clock
    so the test is deterministic under host load."""
    import fastdiff_tpu.utils.profiling as prof

    per_call, rtt = 2e-3, 30e-3
    clock = {"t": 0.0}

    def fake_op(x):
        clock["t"] += per_call
        return x

    def fake_force(v):
        clock["t"] += rtt
        return 0.0

    monkeypatch.setattr(prof.time, "perf_counter", lambda: clock["t"])
    monkeypatch.setattr(prof, "force", fake_force)

    t_slope = prof.device_timer_slope(fake_op, jnp.ones(()), n1=5, n2=25,
                                      reps=2, warmup=0)
    assert abs(t_slope - per_call * 1e3) < 1e-6, t_slope

    # the naive single-loop estimate carries the +rtt/n bias
    t_naive = prof.timed_pipeline(fake_op, jnp.ones(()), n=10) / 10
    assert abs(t_naive - (per_call + rtt / 10)) < 1e-9


def test_device_timer_runs():
    t = device_timer(lambda x: x + 1, jnp.ones((4,)), iters=2, pipeline=2)
    assert t >= 0


def test_rtf_meter():
    m = RTFMeter(sample_rate=100)
    with m.measure(audio_samples=200):
        time.sleep(0.01)
    assert m.audio_seconds == 2.0
    assert m.x_realtime > 1.0
    assert "RTF" in m.summary()
