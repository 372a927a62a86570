"""A/B: NCL megakernel fed by the transposed-emitting head (attack A)
vs the round-3-initial flow (aug head + kern_taug swapaxes), full sampler
N=4, slope-timed. XLA path as control."""
import dataclasses
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from fastdiff_tpu.config import DiffusionConfig, ModelConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.sampler import make_param_sampler
from fastdiff_tpu.models import fastdiff as fd
from fastdiff_tpu.utils.profiling import device_timer_slope, force

SECONDS = 10.0


def health_gate():
    probe = jax.jit(lambda v: v + 1)
    x = jnp.ones((8, 128), jnp.float32)
    force(probe(x))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        force(probe(x))
        ts.append(time.perf_counter() - t0)
    lat = float(np.median(ts)) * 1e3
    print(f"tiny-op forced latency: {lat:.3f} ms "
          f"({'healthy' if lat < 30 else 'DEGRADED'})", flush=True)
    return lat


def bench(cfg, params, label):
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    sample = make_param_sampler(fd.get_apply_fn(cfg), const)
    frames = int(SECONDS * 22050) // 256 // 128 * 128
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(1, frames, 80)),
                      jnp.float32)
    L = frames * 256
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    w = sample(params, key, mel, L)
    assert np.all(np.isfinite(np.asarray(w)))
    print(f"{label}: compile+first {time.time()-t0:.1f}s", flush=True)
    dt = device_timer_slope(lambda k: sample(params, k, mel, L), key,
                            n1=8, n2=24, reps=3)
    audio_s = L / 22050.0
    print(f"{label}: {dt:.2f} ms/utt -> {audio_s/dt*1e3:.0f}x realtime",
          flush=True)
    return dt


def main():
    health_gate()
    cfg = ModelConfig()
    params = fd.init_fastdiff(jax.random.PRNGKey(0), cfg)
    ncl_cfg = dataclasses.replace(cfg, use_pallas_block="ncl")

    t_new = bench(ncl_cfg, params, "ncl-taug-head")

    # old flow: aug-ordered head then swapaxes (what HEAD ships)
    from fastdiff_tpu.ops.lvc_block_ncl import kern_taug_from_aug
    orig = fd._kernel_predictor_apply_taug
    fd._kernel_predictor_apply_taug = (
        lambda p, cond, cfg_, dtype: kern_taug_from_aug(
            fd._kernel_predictor_apply_aug(p, cond, cfg_, dtype)))
    try:
        t_old = bench(ncl_cfg, params, "ncl-swapaxes ")
    finally:
        fd._kernel_predictor_apply_taug = orig

    t_xla = bench(cfg, params, "xla          ")
    health_gate()
    print(f"taug-head vs swapaxes: {t_old/t_new:.2f}x; vs xla: "
          f"{t_xla/t_new:.2f}x", flush=True)


if __name__ == "__main__":
    main()
