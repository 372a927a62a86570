"""Round-4c: in-context A/B of remaining glue candidates, measured at the
FULL SAMPLER level (micro slope timings were swamped by session noise in
the 2026-08-18 session; the ~5-6 ms sampler measurements were stable).

Interleaved A/B: both variants timed alternately inside the same loop
block so session drift cancels.

  down: nearest_downsample_ncl as lane-strided slice (shipped) vs
        selection-matmul (MXU dot with a 0/1 matrix; bit-exact).

Run ALONE on the TPU host:  python scripts/exp_r4c.py
"""

import functools
import sys

sys.path.insert(0, ".")

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fastdiff_tpu.config import DiffusionConfig, ModelConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.sampler import _jitted_sample
from fastdiff_tpu.models import fastdiff as M
from fastdiff_tpu.ops import nn as fnn
from fastdiff_tpu.utils.profiling import device_timer_slope, force

SECONDS = 10.0
SR = 22050
HOP = 256


def _bench_frames():
    frames = int(SECONDS * SR) // HOP
    return ((frames + 127) // 128) * 128


def health_gate():
    import time
    x = jnp.ones((256, 256))
    force(x @ x)
    t0 = time.time()
    force(x @ x)
    ms = 1e3 * (time.time() - t0)
    print(f"| health: forced tiny op {ms:.1f} ms {'OK' if ms < 40 else 'SLOW'}")
    return ms


def _sampler_setup(batch=1):
    params = M.init_fastdiff(jax.random.PRNGKey(0),
                             ModelConfig(use_pallas_block=False))
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    frames = _bench_frames()
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, frames, 80)), jnp.float32)
    args = (jnp.asarray(const.beta), jnp.asarray(const.alpha),
            jnp.asarray(const.sigma), jnp.asarray(const.steps))
    return params, const, mel, frames * HOP, args


_orig_down = fnn.nearest_downsample_ncl


def _down_dot(x, factor, groups=512):
    b, c, length = x.shape
    if length % groups:
        return _orig_down(x, factor)
    sel = np.zeros((groups, groups // factor), np.float32)
    sel[np.arange(0, groups, factor), np.arange(groups // factor)] = 1
    sel = jnp.asarray(sel, x.dtype)
    xg = x.reshape(b * c, length // groups, groups)
    y = jax.lax.dot_general(xg, sel, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return y.astype(x.dtype).reshape(b, c, length // factor)


def run_ab(batch=1):
    print(f"== in-context down-slice vs down-dot, b={batch} ==")
    params, const, mel, length, args = _sampler_setup(batch)
    denoise = functools.partial(
        M.get_apply_fn(ModelConfig(use_pallas_block="ncl")), params)

    def make_run(down_fn):
        fnn.nearest_downsample_ncl = down_fn

        def run(key):
            return _jitted_sample(denoise, key, mel, *args, length,
                                  const.n_steps, False)
        out = run(jax.random.PRNGKey(1))       # compile under this impl
        force(out)
        return run, np.asarray(out)

    # NOTE: both compiles happen up front; jit caches keep each executable
    # alive, and _jitted_sample's cache key includes the traced graph via
    # denoise identity... it does NOT — monkeypatching swaps the traced
    # graph under the same cache key.  Use distinct apply_fn wrappers so the
    # two variants compile to distinct executables.
    def denoise_a(x, m, t):
        return denoise(x, m, t)

    def denoise_b(x, m, t):
        return denoise(x, m, t)

    fnn.nearest_downsample_ncl = _orig_down
    def run_a(key):
        return _jitted_sample(denoise_a, key, mel, *args, length,
                              const.n_steps, False)
    out_a = run_a(jax.random.PRNGKey(1)); force(out_a)

    fnn.nearest_downsample_ncl = _down_dot
    def run_b(key):
        return _jitted_sample(denoise_b, key, mel, *args, length,
                              const.n_steps, False)
    out_b = run_b(jax.random.PRNGKey(1)); force(out_b)
    fnn.nearest_downsample_ncl = _orig_down

    d = np.max(np.abs(np.asarray(out_a) - np.asarray(out_b)))
    print(f"| max |slice - dot|: {d:.3e} (expect 0 — selection is exact)")

    # interleaved slope timing: alternate variants within each rep
    for rep in range(4):
        ms_a = device_timer_slope(lambda: run_a(jax.random.PRNGKey(2)),
                                  n1=4, n2=16, reps=1)
        ms_b = device_timer_slope(lambda: run_b(jax.random.PRNGKey(2)),
                                  n1=4, n2=16, reps=1)
        print(f"| rep{rep}: slice {ms_a:.2f} ms | dot {ms_b:.2f} ms "
              f"(delta {ms_a - ms_b:+.2f})")


def main():
    health_gate()
    run_ab(1)
    run_ab(4)


if __name__ == "__main__":
    main()
