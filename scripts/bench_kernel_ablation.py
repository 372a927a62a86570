"""Megakernel A/B at block shapes: zero-prep fused kernel vs unfused XLA.

History (findings live in docs/PERF.md): the first megakernel materialized
6 halo operands + layout copies per call; xplane traces showed ~1.6 ms/call
of XLA prep around a 1.37 ms kernel at the hop-256 shape, and in-kernel
ablations (rolls/masks/f32 routing/tile size) were all within noise — the
prep, not the body, was the problem. The current kernel reads halos through
shifted BlockSpec index maps (zero HBM prep) and takes the LVC operand in
the augmented (3C+1)-row layout the predictor now emits directly.

Run from repo root on the real chip:
    python scripts/bench_kernel_ablation.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fastdiff_tpu.ops import lvc_block_pallas as K
from fastdiff_tpu.utils.profiling import device_timer_slope, force


def timeit(fn, *args):
    # two-point slope timing cancels the relay fetch RTT (~10-30 ms), which
    # at n=20 pipelining left a +RTT/20 ~ 1.5 ms bias that drowned every
    # sub-ms difference (this is why earlier in-kernel ablations all read
    # "within noise").
    return device_timer_slope(fn, *args, n1=20, n2=100)


def block_shapes(hop, length, c=32, layers=4, b=1):
    frames = length // hop
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, length, c)) * .1, jnp.bfloat16)
    skip = jnp.asarray(rng.standard_normal((b, length, c)) * .1, jnp.bfloat16)
    kernels = jnp.asarray(
        rng.standard_normal((b, frames, layers, 3, c, 2 * c)) * .1, jnp.bfloat16)
    biases = jnp.asarray(rng.standard_normal((b, frames, layers, 2 * c)) * .1,
                         jnp.float32)
    conv_ws = jnp.asarray(rng.standard_normal((layers, 3, c, c)) * .1,
                          jnp.float32)
    conv_bs = jnp.asarray(rng.standard_normal((layers, c)) * .1, jnp.float32)
    return x, skip, kernels, biases, conv_ws, conv_bs


def main():
    probe = jax.jit(lambda v: jnp.sum(v))
    xx = jnp.ones((8, 128), jnp.float32)
    float(probe(xx))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(probe(xx))
        ts.append(time.perf_counter() - t0)
    print(f"tiny-op forced: {np.median(ts)*1e3:.2f} ms", flush=True)

    for hop, length in ((256, 221184), (64, 55296)):
        print(f"\n=== block shape: hop={hop} length={length} ===", flush=True)
        x, skip, kernels, biases, conv_ws, conv_bs = block_shapes(hop, length)
        ka = K.augment_lvc_kernels(kernels, biases.astype(jnp.bfloat16))
        ws = K.stack_conv_weights(list(conv_ws), list(conv_bs))

        unfused = jax.jit(functools.partial(K._unfused_reference, hop=hop))
        fused = jax.jit(functools.partial(K.lvc_block_fused_aug, hop=hop,
                                          interpret=False))
        a = np.asarray(fused(x, skip, ka, ws))
        r = np.asarray(unfused(x, skip, kernels, biases, conv_ws, conv_bs))
        rel = float(np.sqrt(((a - r) ** 2).mean())
                    / max(1e-9, np.sqrt((r ** 2).mean())))
        print(f"parity rel-rms: {rel:.5f} (bf16 noise expected)", flush=True)
        t_u = timeit(unfused, x, skip, kernels, biases, conv_ws, conv_bs)
        t_f = timeit(fused, x, skip, ka, ws)
        print(f"unfused XLA: {t_u:8.3f} ms", flush=True)
        print(f"fused auto : {t_f:8.3f} ms   ({t_u/t_f:.2f}x)", flush=True)

        # tune sweep: tile size x LVC lowering
        frames = length // hop
        for tf_tile in (16, 32, 64):
            if frames % tf_tile:
                continue
            for unroll in (False, True):
                if unroll and tf_tile > 64:
                    continue   # compile-time blowup guard (fe = tf + 2)
                fv = jax.jit(functools.partial(
                    K._fused_call, hop=hop, interpret=False,
                    tile_frames=tf_tile, lvc_unroll=unroll))
                try:
                    t = timeit(fv, x, skip, ka, ws)
                except Exception as e:
                    print(f"  tf={tf_tile:3d} unroll={int(unroll)}: "
                          f"FAILED {type(e).__name__}", flush=True)
                    continue
                print(f"  tf={tf_tile:3d} unroll={int(unroll)}: {t:8.3f} ms",
                      flush=True)

    # --- fused down path (first conv + 3 DBlocks) --------------------------
    print("\n=== down path: L=221184, factors (4,8,8) ===", flush=True)
    from fastdiff_tpu.config import ModelConfig
    from fastdiff_tpu.models.fastdiff import fuse_weight_norm, init_fastdiff
    from fastdiff_tpu.ops import downpath_pallas as DP

    cfg = ModelConfig()
    factors = tuple(reversed(cfg.upsample_ratios))
    p = fuse_weight_norm(init_fastdiff(jax.random.PRNGKey(0), cfg))
    dp_params = {"first_audio_conv": p["first_audio_conv"],
                 "downsample": p["downsample"]}
    audio = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 221184, 1)), jnp.float32)

    unf = jax.jit(lambda a: DP._unfused_reference(dp_params, a, factors))
    fus = jax.jit(lambda a: DP.downpath_fused(dp_params, a, factors, False))
    ro = [np.asarray(o, np.float32) for o in unf(audio)]
    fo = [np.asarray(o, np.float32) for o in fus(audio)]
    rel = max(float(np.sqrt(((a - b) ** 2).mean())
                    / (np.sqrt((b ** 2).mean()) + 1e-12))
              for a, b in zip(fo, ro))
    print(f"parity rel-rms (worst output): {rel:.5f}", flush=True)
    t_u = timeit(unf, audio)
    t_f = timeit(fus, audio)
    print(f"unfused XLA: {t_u:8.3f} ms", flush=True)
    print(f"fused      : {t_f:8.3f} ms   ({t_u/t_f:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
