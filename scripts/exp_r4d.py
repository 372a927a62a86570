"""Round-4d: sampler RNG cost — threefry (default) vs the TPU hardware
RNG (``rbg`` PRNG impl) for the per-step noise draws, A/B'd at the full
sampler level with interleaved reps (same protocol as exp_r4c).

The N=4 sampler draws 5 x (B, L) f32 normals (1 init + 4 per-step);
threefry is a long ALU chain on the VPU, rbg uses the hardware RNG.
Sampling noise has no adversarial requirements — statistical quality of
rbg is ample for diffusion inference (training keeps threefry: exact
reproducibility of the data/noise pipeline matters there).

Run ALONE on the TPU host:  python scripts/exp_r4d.py
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


def run_ab(batch=1):
    print(f"== sampler RNG: threefry vs rbg, b={batch} ==")
    params = M.init_fastdiff(jax.random.PRNGKey(0),
                             ModelConfig(use_pallas_block=False))
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    frames = _bench_frames()
    length = frames * HOP
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (batch, frames, 80)), jnp.float32)
    args = (jnp.asarray(const.beta), jnp.asarray(const.alpha),
            jnp.asarray(const.sigma), jnp.asarray(const.steps))
    denoise = functools.partial(
        M.get_apply_fn(ModelConfig(use_pallas_block="ncl")), params)

    key_tf = jax.random.PRNGKey(1)
    key_rbg = jax.random.key(1, impl="rbg")

    def run_tf(k=key_tf):
        return _jitted_sample(denoise, k, mel, *args, length,
                              const.n_steps, False)

    def run_rbg(k=key_rbg):
        return _jitted_sample(denoise, k, mel, *args, length,
                              const.n_steps, False)

    out_a = run_tf(); force(out_a)
    out_b = run_rbg(); force(out_b)
    sa, sb = np.std(np.asarray(out_a)), np.std(np.asarray(out_b))
    print(f"| output std: threefry {sa:.4f}, rbg {sb:.4f} "
          "(different bits by design; sanity only)")

    for rep in range(4):
        ms_a = device_timer_slope(run_tf, n1=4, n2=16, reps=1)
        ms_b = device_timer_slope(run_rbg, n1=4, n2=16, reps=1)
        print(f"| rep{rep}: threefry {ms_a:.2f} ms | rbg {ms_b:.2f} ms "
              f"(delta {ms_a - ms_b:+.2f})")


def main():
    health_gate()
    run_ab(1)


if __name__ == "__main__":
    main()
