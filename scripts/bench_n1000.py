"""N=1000 full-reverse-process RTF (the BASELINE.md rebuild metric names
RTF per chip at N=4 AND N=1000; the old "~5.3 s -> 1.9x realtime" figure
predates the r3 NCL pivot and the r4 sampler work).

Same forced-completion slope methodology as bench.py, scaled for ~1.4 s
calls: slope between 1- and 3-call pipelined loops, best of 3.

Run ALONE on the TPU host:  python scripts/bench_n1000.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

from fastdiff_tpu.config import DiffusionConfig, ModelConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.diffusion.sampler import make_param_sampler
from fastdiff_tpu.models.fastdiff import (fuse_weight_norm, get_apply_fn,
                                          init_fastdiff)

FRAMES = 864
SR = 22050


def main():
    cfg = ModelConfig(use_pallas_block="ncl")
    params = fuse_weight_norm(init_fastdiff(jax.random.PRNGKey(0), cfg))
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(1000), hp)
    audio_len = FRAMES * cfg.total_hop
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, FRAMES, 80)), jnp.float32)
    sampler = make_param_sampler(get_apply_fn(cfg), const)
    force = jax.jit(lambda v: jnp.sum(v))

    t0 = time.perf_counter()
    float(force(sampler(params, jax.random.PRNGKey(1), mel, audio_len)))
    print(f"| compile+first run {time.perf_counter()-t0:.1f} s", flush=True)

    def timed_loop(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = sampler(params, jax.random.PRNGKey(2 + i), mel, audio_len)
        float(force(out))
        return time.perf_counter() - t0

    best = float("inf")
    for _ in range(3):
        t1, t3 = timed_loop(1), timed_loop(3)
        best = min(best, (t3 - t1) / 2)
        print(f"| loop1 {t1:.3f} s, loop3 {t3:.3f} s -> "
              f"{(t3 - t1) / 2:.3f} s/call", flush=True)

    secs = audio_len / SR
    print(f"== N=1000: {best:.3f} s per {secs:.2f} s utterance -> "
          f"{secs / best:.2f}x realtime ({best * 1e3 / 1000:.3f} ms/step)")


if __name__ == "__main__":
    main()
