"""Isolate the megakernel's matmul stages to find the structural cost.

The whole-block kernel (ops/lvc_block_pallas.py) measures ~4.45 ms at the
hop-256 block shape while in-kernel ablations (rolls/masks/f32/tile size)
all land within noise — so the cost is in what remains: the per-layer conv
dot (E,97)@(97,32) and the per-frame grouped LVC dot
(Fe,hop,97)@(Fe,97,64). This benchmark times each stage ALONE in a
minimal pallas_call at full block scale, against analytic bounds:

  conv  (221184, 97)@(97, 32) x4 layers: ~5.5 GFLOP useful, 25% lane cap
  LVC   864 frames x (256, 97)@(97, 64) x4: ~11 GFLOP useful, 50% lane cap
  -> ideal MXU time ~230 us total; anything ms-scale is Mosaic overhead.

Variants probe Mosaic's grouped-GEMM lowering: batched dot_general vs an
unrolled per-frame loop vs a lax.fori_loop over frames.

Run from repo root on the real chip:
    python scripts/bench_mosaic_micro.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fastdiff_tpu.utils.profiling import device_timer_slope, force

ROWS = 97          # 3*32 taps + 1 bias row
C = 32
C2 = 64
LAYERS = 4


def timeit(fn, *args):
    # slope timing: the relay fetch RTT here is ~10-30 ms; amortizing it
    # over n calls still leaves +RTT/n of bias, which dominates sub-ms
    # kernels. The two-point slope cancels every constant.
    return device_timer_slope(fn, *args, n1=20, n2=120)


# --- stage kernels -------------------------------------------------------

def _conv_body(tap_ref, w_ref, o_ref, *, layers):
    x = tap_ref[0]
    for i in range(layers):
        y = jax.lax.dot(x, w_ref[i], preferred_element_type=jnp.float32)
        x = jnp.concatenate(
            [y.astype(x.dtype), y.astype(x.dtype), y.astype(x.dtype),
             jnp.ones((x.shape[0], 1), x.dtype)], axis=1)
    o_ref[0] = x[:, :C]


def conv_stage(tap, w, tile_s):
    """tap (B, E, ROWS) bf16, w (layers, ROWS, C). 4 chained conv dots."""
    b, e, _ = tap.shape
    grid = (b, e // tile_s)
    return pl.pallas_call(
        functools.partial(_conv_body, layers=LAYERS),
        grid=grid,
        in_specs=[pl.BlockSpec((1, tile_s, ROWS), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((LAYERS, ROWS, C), lambda bi, ti: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tile_s, C), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, e, C), tap.dtype),
    )(tap, w)


def _lvc_body(tap_ref, k_ref, o_ref, *, hop, variant):
    tf = k_ref.shape[1]
    tap = tap_ref[0].reshape(tf, hop, ROWS)
    kern = k_ref[0]
    if variant == "batched":
        z = jax.lax.dot_general(
            tap, kern, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
    elif variant == "unroll":
        zs = [jax.lax.dot(tap[f], kern[f],
                          preferred_element_type=jnp.float32)
              for f in range(tf)]
        z = jnp.stack(zs)
    else:
        raise ValueError(variant)
    o_ref[0] = z.reshape(tf * hop, C2).astype(o_ref.dtype)


def lvc_stage(tap, kern, hop, tf, variant):
    """tap (B, L, ROWS) bf16, kern (B, F, ROWS, C2). Grouped GEMM, 1 layer."""
    b, length, _ = tap.shape
    frames = kern.shape[1]
    grid = (b, frames // tf)
    return pl.pallas_call(
        functools.partial(_lvc_body, hop=hop, variant=variant),
        grid=grid,
        in_specs=[pl.BlockSpec((1, tf * hop, ROWS),
                               lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tf, ROWS, C2), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tf * hop, C2), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, length, C2), tap.dtype),
    )(tap, kern)


def gate_stage(z):
    """The per-layer VPU epilogue alone: sigmoid x tanh at (L, 64) f32."""
    return jax.nn.sigmoid(z[..., :C]) * jnp.tanh(z[..., C:])


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

    hop, length = 256, 221184
    frames = length // hop
    rng = np.random.default_rng(0)
    tap = jnp.asarray(rng.standard_normal((1, length, ROWS)) * .1,
                      jnp.bfloat16)
    kern = jnp.asarray(rng.standard_normal((1, frames, ROWS, C2)) * .1,
                       jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((LAYERS, ROWS, C)) * .1, jnp.bfloat16)
    z = jnp.asarray(rng.standard_normal((1, length, C2)) * .1, jnp.float32)

    print(f"\n=== hop={hop} L={length} (the hop-256 block shape) ===",
          flush=True)
    print("analytic: conv x4 ~112 us @25% lanes, LVC x4 ~112 us @50% lanes",
          flush=True)

    for tile_s in (2048, 4096, 8192):
        f = jax.jit(functools.partial(conv_stage, tile_s=tile_s))
        t = timeit(f, tap, w)
        print(f"conv x4 chained, tile_s={tile_s:5d}: {t:7.3f} ms", flush=True)

    for variant in ("batched", "unroll"):
        for tf in (8, 16, 32):
            f = jax.jit(functools.partial(lvc_stage, hop=hop, tf=tf,
                                          variant=variant))
            t = timeit(f, tap, kern)
            print(f"LVC x1 {variant:8s} tf={tf:3d}: {t:7.3f} ms "
                  f"(x4 layers -> {4*t:7.3f})", flush=True)

    f = jax.jit(gate_stage)
    t = timeit(f, z)
    print(f"gate epilogue x1 (XLA, f32): {t:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
