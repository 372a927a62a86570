"""Megakernel ablation study: where does the fused LVC block's time go?

Times kernel VARIANTS of ops/lvc_block_pallas.py at the hop-256 (block 2)
and hop-64 (block 1) shapes of the default model against the jitted
unfused XLA path, with forced-completion fencing (docs/PERF.md). Variants:

  base        — the production kernel as-is (bf16 carry, pltpu.roll via f32)
  f32carry    — carry/taps kept f32 in-kernel; bf16 only at matmul operands
  nomask      — validity masking removed (bounds the mask cost; WRONG at
                sequence edges, ablation only)
  noroll      — tap shifts removed entirely (WRONG; bounds total shift cost)
  tf<k>       — tile-size sweep (frames per program)

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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from fastdiff_tpu.ops import lvc_block_pallas as K
from fastdiff_tpu.utils.profiling import force

_LANES = 128


def _leaky(x, slope=0.2):
    return jnp.maximum(x, x * slope)


def _kernel_body_v(xc, lhx, rhx, skc, lhs, rhs, kc, lhk, rhk, wstack, out_ref,
                   *, hop, layers, c, length, tile_s, halo,
                   carry_f32, mask, do_roll):
    ext_e = tile_s + 2 * halo
    fe = ext_e // hop
    ti = pl.program_id(1)

    cat = jnp.concatenate
    carry = cat([lhx[0, 0], xc[0, 0], rhx[0, 0]], axis=0)
    skip = cat([lhs[0, 0], skc[0, 0], rhs[0, 0]], axis=0)
    kern = cat([lhk[0, 0], kc[0, 0], rhk[0, 0]], axis=0)
    mm_dtype = carry.dtype            # bf16 matmul operands always
    if carry_f32:
        carry = carry.astype(jnp.float32)
        skip = skip.astype(jnp.float32)

    gpos = (jax.lax.broadcasted_iota(jnp.int32, (ext_e, 1), 0)
            + ti * tile_s - halo)
    valid = jnp.logical_and(gpos >= 0, gpos < length)
    aug32 = (jax.lax.broadcasted_iota(
        jnp.int32, (ext_e, _LANES - 3 * c), 1) == 0)

    def _roll(arr, shift):
        if do_roll == "slice":
            # static slice + concat instead of dynamic_rotate
            s = (-shift) % ext_e
            return jnp.concatenate([arr[s:], arr[:s]], axis=0)
        if not do_roll:
            return arr
        if arr.dtype == jnp.float32:
            return pltpu.roll(arr, shift % ext_e, 0)
        rolled = pltpu.roll(arr.astype(jnp.float32), shift % ext_e, 0)
        return rolled.astype(arr.dtype)

    for i in range(layers):
        d = 3 ** i
        s = carry + skip
        if mask:
            s = jnp.where(valid, s, jnp.zeros_like(s))
        y = _leaky(s)
        aug = aug32.astype(y.dtype)
        tap = cat([_roll(y, d), y, _roll(y, -d), aug], axis=1)
        y = jax.lax.dot(tap.astype(mm_dtype), wstack[i],
                        preferred_element_type=jnp.float32)
        y = _leaky(y)
        if not carry_f32:
            y = y.astype(mm_dtype)
        if mask:
            y = jnp.where(valid, y, jnp.zeros_like(y))
        aug = aug32.astype(y.dtype)
        tap = cat([_roll(y, 1), y, _roll(y, -1), aug], axis=1)
        win = tap.astype(mm_dtype).reshape(fe, hop, _LANES)
        z = jax.lax.dot_general(
            win, kern[:, i],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        gate = jax.nn.sigmoid(z[..., :c]) * jnp.tanh(z[..., c:])
        carry = s + gate.reshape(ext_e, c).astype(s.dtype)

    out_ref[0, 0] = carry[halo: halo + tile_s].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "hop", "carry_f32", "mask", "do_roll", "tf_override"))
def fused_variant(x, skip, kern_aug, wstack, hop,
                  carry_f32=False, mask=True, do_roll=True, tf_override=0):
    b, length, c = x.shape
    _, frames, layers, _, _ = kern_aug.shape
    tf = tf_override or K._pick_tile_frames(frames, hop)
    n_tiles = frames // tf
    tile_s = tf * hop
    halo = max(hop, K._MIN_HALO)
    hf = halo // hop
    grid = (b, n_tiles)

    x4 = x.reshape(b, n_tiles, tile_s, c)
    sk4 = skip.reshape(b, n_tiles, tile_s, c)
    lhx, rhx = K._edge_halos(x, n_tiles, tile_s, halo)
    lhs, rhs = K._edge_halos(skip, n_tiles, tile_s, halo)
    k4 = kern_aug.reshape(b, n_tiles, tf, layers, _LANES, 2 * c)
    kflat = kern_aug
    lhk = jnp.pad(kflat, ((0, 0), (hf, 0), (0, 0), (0, 0), (0, 0)))[:, :frames]
    rhk = jnp.pad(kflat, ((0, 0), (0, hf), (0, 0), (0, 0), (0, 0)))[:, hf:]
    lhk = lhk.reshape(b, n_tiles, tf, layers, _LANES, 2 * c)[:, :, :hf]
    rhk = rhk.reshape(b, n_tiles, tf, layers, _LANES, 2 * c)[:, :, tf - hf:]

    def tile_spec(rows):
        return pl.BlockSpec((1, 1, rows, c), lambda bi, ti: (bi, ti, 0, 0),
                            memory_space=pltpu.VMEM)

    def kern_spec(rows):
        return pl.BlockSpec((1, 1, rows, layers, _LANES, 2 * c),
                            lambda bi, ti: (bi, ti, 0, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec((layers, _LANES, c), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel_body_v, hop=hop, layers=layers, c=c,
                          length=length, tile_s=tile_s, halo=halo,
                          carry_f32=carry_f32, mask=mask, do_roll=do_roll),
        grid=grid,
        in_specs=[tile_spec(tile_s), tile_spec(halo), tile_spec(halo),
                  tile_spec(tile_s), tile_spec(halo), tile_spec(halo),
                  kern_spec(tf), kern_spec(hf), kern_spec(hf), wspec],
        out_specs=tile_spec(tile_s),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, tile_s, c), x.dtype),
    )(x4, lhx, rhx, sk4, lhs, rhs, k4, lhk, rhk, wstack)
    return out.reshape(b, length, c)


def timeit(fn, *args, n=20):
    force(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    force(out)
    return (time.perf_counter() - t0) / n * 1e3


def block_shapes(hop, length=221184, c=32, layers=4, b=1):
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
    # health gate
    probe = jax.jit(lambda v: jnp.sum(v))
    xx = jnp.ones((8, 128), jnp.float32)
    float(probe(xx))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter(); float(probe(xx)); ts.append(time.perf_counter() - t0)
    print(f"tiny-op forced: {np.median(ts)*1e3:.2f} ms", flush=True)

    for hop, length in ((256, 221184), (64, 55296)):
        print(f"\n=== block shape: hop={hop} length={length} ===", flush=True)
        x, skip, kernels, biases, conv_ws, conv_bs = block_shapes(hop, length)
        kern_aug = K.augment_lvc_kernels(kernels, biases.astype(jnp.bfloat16))
        wstack = K.stack_conv_weights(list(conv_ws), list(conv_bs))

        unfused = jax.jit(functools.partial(K._unfused_reference, hop=hop))
        print(f"unfused XLA       : {timeit(unfused, x, skip, kernels, biases, conv_ws, conv_bs):8.2f} ms", flush=True)

        variants = [
            ("base", dict()),
            ("f32carry", dict(carry_f32=True)),
            ("nomask", dict(mask=False)),
            ("nomask+f32carry", dict(mask=False, carry_f32=True)),
            ("sliceshift", dict(do_roll="slice")),
            ("sliceshift+f32", dict(do_roll="slice", carry_f32=True)),
            ("noroll (WRONG)", dict(do_roll=False)),
            ("noroll+f32 (WRONG)", dict(do_roll=False, carry_f32=True)),
        ]
        for tf in (0, 4, 16, 32):
            tag = f" tf={tf}" if tf else ""
            for name, kw in variants:
                if tf and name != "f32carry":
                    continue
                fn = functools.partial(fused_variant, hop=hop, tf_override=tf,
                                       **kw)
                try:
                    ms = timeit(fn, x, skip, kern_aug, wstack)
                    print(f"fused {name:18s}{tag}: {ms:8.2f} ms", flush=True)
                except Exception as e:
                    print(f"fused {name:18s}{tag}: FAILED {type(e).__name__}: {e}",
                          flush=True)


if __name__ == "__main__":
    main()
