"""A/B: whole-block Pallas megakernel vs the XLA path, full sampler N=4.

Pipelined timing (block once at the end), tiny-op health gate, one session.
"""
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
from fastdiff_tpu.models.fastdiff import get_apply_fn, init_fastdiff

SECONDS = 10.0
N_ITER = 20


def health_gate():
    # forced-completion probe (profiling.force): block_until_ready through
    # the relay can ACK early, so fetch real bytes
    from fastdiff_tpu.utils.profiling import force
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
          f"({'healthy' if lat < 30 else 'DEGRADED'})")
    return lat


def bench(cfg, params, label):
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    sample = make_param_sampler(get_apply_fn(cfg), const)
    frames = int(SECONDS * 22050) // 256 // 128 * 128
    mel = jnp.asarray(np.random.default_rng(0).normal(size=(1, frames, 80)),
                      jnp.float32)
    L = frames * 256
    from fastdiff_tpu.utils.profiling import force
    t0 = time.time()
    key = jax.random.PRNGKey(0)
    w = sample(params, key, mel, L)
    assert np.all(np.isfinite(np.asarray(w)))
    print(f"{label}: compile+first {time.time()-t0:.1f}s")
    t0 = time.perf_counter()
    for i in range(N_ITER):
        w = sample(params, jax.random.fold_in(key, i), mel, L)
    force(w)
    dt = (time.perf_counter() - t0) / N_ITER
    audio_s = L / 22050.0
    print(f"{label}: {dt*1e3:.2f} ms/utt -> {audio_s/dt:.0f}x realtime")
    return dt


def main():
    health_gate()
    cfg = ModelConfig()
    params = init_fastdiff(jax.random.PRNGKey(0), cfg)
    t_xla = bench(cfg, params, "xla    ")
    t_fused = bench(dataclasses.replace(cfg, use_pallas_block=True),
                    params, "fused  ")
    health_gate()
    print(f"speedup: {t_xla / t_fused:.2f}x")


if __name__ == "__main__":
    main()
