"""One-shot perf investigation on the real chip (run in background, never
SIGKILL — killed device grants wedge the chip for ~15 min).

Covers: conv dtype/epilogue variants, dblock decomposition, full-forward
vs component sum, sampler overhead vs 4x forward.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def t(f, *args, n=20):
    # forced-completion timing (profiling.force): the relay's
    # block_until_ready can ACK before execution completes
    from fastdiff_tpu.utils.profiling import force
    force(f(*args))
    t0 = time.perf_counter()
    o = None
    for _ in range(n):
        o = f(*args)
    force(o)
    return (time.perf_counter() - t0) / n * 1000


def conv(x, w, dil=1, pref=jnp.float32):
    return jax.lax.conv_general_dilated(
        x, w, (1,), [(dil, dil)], rhs_dilation=(dil,),
        dimension_numbers=("NWC", "WIO", "NWC"), preferred_element_type=pref)


def main():
    L = 221184
    rng = np.random.default_rng(0)
    x32 = jnp.asarray(rng.standard_normal((1, L, 32)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 32, 32)) * 0.1, jnp.bfloat16)
    bf = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    bh = bf.astype(jnp.bfloat16)
    lrelu = lambda v: jnp.where(v >= 0, v, 0.2 * v)

    print(f"A conv f32-out            : {t(jax.jit(lambda x: conv(x, w)), x32):7.2f} ms", flush=True)
    print(f"B conv f32-out+bias->bf16 : {t(jax.jit(lambda x: (conv(x, w) + bf).astype(jnp.bfloat16)), x32):7.2f} ms", flush=True)
    print(f"C conv bf16-out+bias bf16 : {t(jax.jit(lambda x: conv(x, w, pref=jnp.bfloat16) + bh), x32):7.2f} ms", flush=True)

    def chain_f32(x):
        for dil in (1, 2, 4):
            x = (conv(lrelu(x), w, dil) + bf).astype(jnp.bfloat16)
        return x

    def chain_bf16(x):
        for dil in (1, 2, 4):
            x = conv(lrelu(x), w, dil, pref=jnp.bfloat16) + bh
        return x

    print(f"D chain3 f32-out          : {t(jax.jit(chain_f32), x32):7.2f} ms", flush=True)
    print(f"E chain3 bf16-out         : {t(jax.jit(chain_bf16), x32):7.2f} ms", flush=True)

    # full model: current vs sampler overhead
    from fastdiff_tpu.config import ModelConfig, DiffusionConfig
    from fastdiff_tpu.models.fastdiff import (init_fastdiff, fastdiff_apply,
                                              fuse_weight_norm)
    from fastdiff_tpu.diffusion import schedules
    from fastdiff_tpu.diffusion.sampler import make_sampler

    cfg = ModelConfig()
    params = fuse_weight_norm(init_fastdiff(jax.random.PRNGKey(0), cfg))
    frames = 864
    a = jnp.zeros((1, frames * 256, 1))
    m = jnp.zeros((1, frames, 80))
    tt = jnp.ones((1, 1))
    fwd = jax.jit(lambda a, m, tt: fastdiff_apply(params, a, m, tt, cfg))
    fms = t(fwd, a, m, tt)
    print(f"F full forward            : {fms:7.2f} ms", flush=True)

    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig()))
    const = schedules.sampler_constants_for_schedule(
        schedules.noise_schedule_for_steps(4), hp)
    sampler = make_sampler(
        lambda x, mel, step: fastdiff_apply(params, x, mel, step, cfg), const)
    sms = t(lambda m: sampler(jax.random.PRNGKey(0), m, frames * 256), m)
    print(f"G sampler N=4             : {sms:7.2f} ms "
          f"(overhead vs 4x fwd: {sms - 4 * fms:+.2f} ms)", flush=True)

    # batched throughput: batch 8 on one chip
    m8 = jnp.zeros((8, frames, 80))
    s8 = t(lambda m: sampler(jax.random.PRNGKey(0), m, frames * 256), m8, n=5)
    audio_s = 8 * frames * 256 / 22050
    print(f"H sampler N=4 batch8      : {s8:7.2f} ms "
          f"({audio_s / (s8 / 1000):6.0f}x realtime aggregate)", flush=True)


if __name__ == "__main__":
    main()
