"""Component-level timing of the denoiser forward on the real TPU.

Times each stage of the FastDiff forward in isolation (jitted separately at
the bench shapes) to find where sampler wall-clock goes. Run from repo root:
    python scripts/profile_sampler.py [frames]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from fastdiff_tpu.config import ModelConfig
from fastdiff_tpu.models import fastdiff as M
from fastdiff_tpu.ops import nn as fnn


def timeit(fn, *args):
    # two-point slope timing: cancels the relay fetch RTT (~10-30 ms) that
    # a single pipelined loop only amortizes (+RTT/n bias — it drowned
    # sub-ms components; see utils/profiling.device_timer_slope)
    from fastdiff_tpu.utils.profiling import device_timer_slope
    return device_timer_slope(fn, *args, n1=10, n2=60)


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 864
    cfg = ModelConfig()
    dtype = jnp.bfloat16
    params = M.init_fastdiff(jax.random.PRNGKey(0), cfg)
    b = 1
    L = frames * cfg.total_hop
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((b, L, 1)), jnp.float32)
    mel = jnp.asarray(rng.standard_normal((b, frames, 80)), jnp.float32)
    t = jnp.ones((b, 1), jnp.float32)

    full = jax.jit(lambda a, m, tt: M.fastdiff_apply(params, a, m, tt, cfg))
    print(f"full forward      : {timeit(full, audio, mel, t):8.2f} ms")

    # kernel predictor x3
    def kp_all(mel):
        outs = []
        for n in range(3):
            k, bb = M._kernel_predictor_apply(
                params["lvc_blocks"][n]["kernel_predictor"],
                mel.astype(dtype), cfg, dtype)
            outs.append((k.sum(), bb.sum()))
        return outs
    print(f"kernel preds (x3) : {timeit(jax.jit(kp_all), mel):8.2f} ms")

    # downsample path
    def down(a):
        x = fnn.conv1d(params["first_audio_conv"], a.astype(dtype),
                       compute_dtype=dtype, impl=cfg.conv_impl)
        for n, dblock in enumerate(params["downsample"]):
            # impl must match the model's (round-2 bug: the default 'lax'
            # here measured 1.08 ms for a path that really runs 0.44)
            x = M._dblock_apply(dblock, x, cfg.upsample_ratios[2 - n], dtype,
                                impl=cfg.conv_impl)
        return x
    print(f"input+down path   : {timeit(jax.jit(down), audio):8.2f} ms")

    # one LVC block at each scale, with precomputed kernels
    x256 = jnp.asarray(rng.standard_normal((b, L // 256, 32)), dtype)
    skip32 = jnp.asarray(rng.standard_normal((b, L // 32, 32)), dtype)
    emb = jnp.asarray(rng.standard_normal((b, 512)), jnp.float32)
    for n, (ratio, hop) in enumerate(zip(cfg.upsample_ratios,
                                         cfg.cond_hop_lengths)):
        xin = jnp.asarray(rng.standard_normal((b, L // (256 // (1 if n == 0 else 1)), 32)), dtype) \
            if False else None
        # input length for block n: L_in = L / prod(ratios[n:]) * ratios[n] ... compute directly
        l_in = L
        for r in cfg.upsample_ratios[n:]:
            l_in //= r
        xin = jnp.asarray(rng.standard_normal((b, l_in, 32)), dtype)
        skip = jnp.asarray(rng.standard_normal((b, l_in * ratio, 32)), dtype)

        def blk(xin, skip, mel, emb, n=n, ratio=ratio, hop=hop):
            return M._lvc_block_apply(params["lvc_blocks"][n], xin, skip,
                                      mel.astype(dtype), emb, ratio, hop,
                                      cfg, dtype)
        ms = timeit(jax.jit(blk), xin, skip, mel, emb)
        print(f"lvc block {n} (hop {hop:3d}): {ms:8.2f} ms")

    # LVC op alone at the largest scale (hop 256)
    from fastdiff_tpu.ops.lvc import location_variable_convolution
    y = jnp.asarray(rng.standard_normal((b, L, 32)), dtype)
    ker = jnp.asarray(rng.standard_normal((b, frames, 3, 32, 64)), dtype)
    bia = jnp.asarray(rng.standard_normal((b, frames, 64)), jnp.float32)
    lvc = jax.jit(lambda y, k, bb: location_variable_convolution(y, k, bb, 256))
    print(f"lvc op hop256     : {timeit(lvc, y, ker, bia):8.2f} ms")


if __name__ == "__main__":
    main()
