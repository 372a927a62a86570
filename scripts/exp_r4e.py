"""Round-4e: in-context A/B of the hop-8 fused-head policy (FH_MAX_HOP
0 vs 8) + the sigma-zeroed sampler update, full-sampler interleaved reps.

Run ALONE on the TPU host:  python scripts/exp_r4e.py
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
from fastdiff_tpu.ops import lvc_block_ncl as NCL
from fastdiff_tpu.utils.profiling import device_timer_slope, force

SECONDS = 10.0
SR = 22050
HOP = 256


def health_gate():
    import time
    x = jnp.ones((256, 256))
    force(x @ x)
    t0 = time.time()
    force(x @ x)
    ms = 1e3 * (time.time() - t0)
    print(f"| health: forced tiny op {ms:.1f} ms {'OK' if ms < 40 else 'SLOW'}")
    return ms


def run_ab(batch=1):
    print(f"== hop-8 fused head: FH_MAX_HOP 0 vs 8, b={batch} ==")
    frames = ((int(SECONDS * SR) // HOP + 127) // 128) * 128
    length = frames * HOP
    params = M.init_fastdiff(jax.random.PRNGKey(0),
                             ModelConfig(use_pallas_block=False))
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, frames, 80)), jnp.float32)
    args = (jnp.asarray(const.beta), jnp.asarray(const.alpha),
            jnp.asarray(const.sigma), jnp.asarray(const.steps))
    denoise = functools.partial(
        M.get_apply_fn(ModelConfig(use_pallas_block="ncl")), params)

    def denoise_a(x, m, t):
        return denoise(x, m, t)

    def denoise_b(x, m, t):
        return denoise(x, m, t)

    NCL.FH_MAX_HOP = 0
    def run_a(key=jax.random.PRNGKey(1)):
        return _jitted_sample(denoise_a, key, mel, *args, length,
                              const.n_steps, False)
    out_a = run_a(); force(out_a)

    NCL.FH_MAX_HOP = 8
    def run_b(key=jax.random.PRNGKey(1)):
        return _jitted_sample(denoise_b, key, mel, *args, length,
                              const.n_steps, False)
    out_b = run_b(); force(out_b)
    NCL.FH_MAX_HOP = 8

    d = np.max(np.abs(np.asarray(out_a) - np.asarray(out_b)))
    print(f"| max |no-fh - hop8-fh|: {d:.3e} (expect 0 — fh is bit-exact)")

    for rep in range(4):
        ms_a = device_timer_slope(run_a, n1=4, n2=16, reps=1)
        ms_b = device_timer_slope(run_b, n1=4, n2=16, reps=1)
        print(f"| rep{rep}: fh-off {ms_a:.2f} ms | hop8-fh {ms_b:.2f} ms "
              f"(delta {ms_a - ms_b:+.2f})")


def main():
    health_gate()
    run_ab(1)
    run_ab(4)


if __name__ == "__main__":
    main()
