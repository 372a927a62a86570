"""Whole-LVC-block fused Pallas TPU kernel (the round-2 megakernel).

Fuses the entire 4-layer inner loop of a TimeAware LVC block
(reference: modules/FastDiff/module/modules.py:208-217; XLA formulation in
fastdiff_tpu/models/fastdiff.py:_lvc_block_apply):

    for i in 0..3:                      # one VMEM-resident pass, no HBM
        s = x + skip                    #   round trips between layers
        y = leaky_relu(s, 0.2)
        y = leaky_relu(conv1d(y, dilation=3**i) + b_i, 0.2)
        x = s + sigmoid(z[..:C]) * tanh(z[C:..]),  z = LVC(y, k_i) + bias_i

The unfused path runs ~25 small XLA ops per block per denoiser call, each
bounded by HBM round trips at (L, 32) shapes; here one kernel reads
x/skip/predicted-kernels once and writes x once.

Mapping:
- grid = (B, L / (TF*hop)); each program owns a tile of TF LVC frames.
- Halos: the 4-layer receptive field is 44 samples/side (dilated convs
  sum(3^i) + LVC taps). Halo operands are frame-aligned XLA shifts of the
  inputs (H = max(hop, 48) samples), concatenated in-kernel; layer math runs
  on the extended tile and only the valid center is written back. In-kernel
  shifts are ``pltpu.roll``: wrap-around contamination stays inside the
  (discarded) margin because H >= 48 > 44.
- Sequence-edge parity: the unfused path zero-pads EVERY conv/LVC input at
  the true sequence edges; a validity mask (global position in [0, L))
  re-zeros the carry and the conv output each layer so halo garbage can't
  leak in — bit-exact edge semantics, not just interior parity.
- Both matmuls ride one augmented 128-lane contraction (round-1 trick,
  lvc_pallas.py): tap matrices get a constant one-column at lane 3C and the
  weight operands carry the bias in that row, so bias-add is free MXU work.
    conv:  (E, 128) @ (128, C)                  E = (TF + 2) * hop samples
    LVC:   (Fe, hop, 128) @ (Fe, 128, 2C)       Fe = E / hop frames
- hop < 64 (the first, T/32-rate block) falls back to the XLA path: those
  tiles would be mostly padding and carry ~3% of the sample work.

Differentiation: ``lvc_block_fused`` carries a custom VJP whose backward
recomputes through the *unfused* XLA path (identical math), so the flag can
stay on under ``jax.grad``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastdiff_tpu.ops.lvc import lvc_gated_residual

_LANES = 128
_MIN_FUSED_HOP = 64
_MIN_HALO = 48          # >= 44-sample receptive field, multiple of 8


def _leaky(x, slope=0.2):
    # max-form leaky relu (valid for 0 < slope < 1): Mosaic has no bf16
    # vector compare ("Target does not support this comparison"), but
    # bf16 maximum lowers fine.
    return jnp.maximum(x, x * slope)


def _kernel_body(xc, lhx, rhx, skc, lhs, rhs, kc, lhk, rhk, wstack, out_ref,
                 *, hop: int, layers: int, c: int, length: int,
                 tile_s: int, halo: int):
    ext_e = tile_s + 2 * halo
    fe = ext_e // hop
    ti = pl.program_id(1)

    carry = jnp.concatenate([lhx[0, 0], xc[0, 0], rhx[0, 0]], axis=0)
    skip = jnp.concatenate([lhs[0, 0], skc[0, 0], rhs[0, 0]], axis=0)
    kern = jnp.concatenate([lhk[0, 0], kc[0, 0], rhk[0, 0]], axis=0)

    gpos = (jax.lax.broadcasted_iota(jnp.int32, (ext_e, 1), 0)
            + ti * tile_s - halo)
    valid = jnp.logical_and(gpos >= 0, gpos < length)        # (E, 1)
    aug = (jax.lax.broadcasted_iota(
        jnp.int32, (ext_e, _LANES - 3 * c), 1) == 0).astype(carry.dtype)

    def _roll(arr, shift):
        # pltpu.roll wants a non-negative shift, and Mosaic's tpu.dynamic_
        # rotate only supports 32-bit element types — route bf16 through f32.
        if arr.dtype == jnp.float32:
            return pltpu.roll(arr, shift % ext_e, 0)
        rolled = pltpu.roll(arr.astype(jnp.float32), shift % ext_e, 0)
        return rolled.astype(arr.dtype)

    for i in range(layers):
        d = 3 ** i
        s = carry + skip
        s = jnp.where(valid, s, jnp.zeros_like(s))
        y = _leaky(s)
        tap = jnp.concatenate(
            [_roll(y, d), y, _roll(y, -d), aug], axis=1)
        y = jax.lax.dot(tap, wstack[i],
                        preferred_element_type=jnp.float32)
        y = _leaky(y).astype(carry.dtype)
        y = jnp.where(valid, y, jnp.zeros_like(y))

        tap = jnp.concatenate(
            [_roll(y, 1), y, _roll(y, -1), aug], axis=1)
        win = tap.reshape(fe, hop, _LANES)
        z = jax.lax.dot_general(
            win, kern[:, i],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)              # (Fe, hop, 2C)
        gate = jax.nn.sigmoid(z[..., :c]) * jnp.tanh(z[..., c:])
        carry = s + gate.reshape(ext_e, c).astype(s.dtype)

    out_ref[0, 0] = carry[halo: halo + tile_s]


def _pick_tile_frames(n_frames: int, hop: int) -> int:
    """Frames per program: ~2k center samples, dividing n_frames."""
    target = max(1, 2048 // hop)
    divisors = [tf for tf in range(1, n_frames + 1) if n_frames % tf == 0]
    return min(divisors, key=lambda tf: abs(tf - target))


def _edge_halos(x: jnp.ndarray, n_tiles: int, tile: int, halo: int):
    """(B, L, C) -> left/right halo tensors (B, nT, halo, C), zero-padded at
    the sequence boundary (== conv zero-padding semantics at the edges)."""
    b, length, c = x.shape
    lh = jnp.pad(x, ((0, 0), (halo, 0), (0, 0)))[:, :length]
    rh = jnp.pad(x, ((0, 0), (0, halo), (0, 0)))[:, halo:]
    lh = lh.reshape(b, n_tiles, tile, c)[:, :, :halo]
    rh = rh.reshape(b, n_tiles, tile, c)[:, :, tile - halo:]
    return lh, rh


def stack_conv_weights(conv_ws, conv_bs, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dilated-conv weights+biases -> augmented (layers, 128, C) operand.

    Rows [0, 3C) are the (K=3, C, C) taps flattened tap-major (matching the
    kernel's tap concat order), row 3C is the bias, the rest zero.
    """
    ws = jnp.stack([w.reshape(-1, w.shape[-1]) for w in conv_ws])  # (l,3C,C)
    bs = jnp.stack(conv_bs)                                        # (l, C)
    layers, three_c, c = ws.shape
    pad = _LANES - three_c - 1
    return jnp.concatenate([
        ws, bs[:, None, :], jnp.zeros((layers, pad, c), ws.dtype)],
        axis=1).astype(dtype)


def augment_lvc_kernels(kernels: jnp.ndarray, biases: jnp.ndarray) -> jnp.ndarray:
    """(B,F,l,K,C,2C) kernels + (B,F,l,2C) biases -> (B,F,l,128,2C) with the
    bias in contraction row K*C (round-1 augmentation, lvc_pallas.py)."""
    b, f, layers, k, c, c2 = kernels.shape
    kflat = kernels.reshape(b, f, layers, k * c, c2)
    pad = _LANES - k * c - 1
    return jnp.concatenate([
        kflat, biases[..., None, :].astype(kflat.dtype),
        jnp.zeros((b, f, layers, pad, c2), kflat.dtype)], axis=3)


def fusable(hop: int, n_frames: int) -> bool:
    return hop >= _MIN_FUSED_HOP and n_frames >= 2


@functools.partial(jax.jit, static_argnames=("hop", "interpret"))
def _fused_call(x, skip, kern_aug, wstack, hop: int, interpret: bool = False):
    b, length, c = x.shape
    _, frames, layers, _, _ = kern_aug.shape
    assert length == frames * hop, (length, frames, hop)

    tf = _pick_tile_frames(frames, hop)
    n_tiles = frames // tf
    tile_s = tf * hop
    halo = max(hop, _MIN_HALO)            # frame-aligned (hop >= 64 here)
    hf = halo // hop
    grid = (b, n_tiles)

    x4 = x.reshape(b, n_tiles, tile_s, c)
    sk4 = skip.reshape(b, n_tiles, tile_s, c)
    lhx, rhx = _edge_halos(x, n_tiles, tile_s, halo)
    lhs, rhs = _edge_halos(skip, n_tiles, tile_s, halo)

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
        functools.partial(_kernel_body, hop=hop, layers=layers, c=c,
                          length=length, tile_s=tile_s, halo=halo),
        grid=grid,
        in_specs=[tile_spec(tile_s), tile_spec(halo), tile_spec(halo),
                  tile_spec(tile_s), tile_spec(halo), tile_spec(halo),
                  kern_spec(tf), kern_spec(hf), kern_spec(hf), wspec],
        out_specs=tile_spec(tile_s),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles, tile_s, c), x.dtype),
        interpret=interpret,
    )(x4, lhx, rhx, sk4, lhs, rhs, k4, lhk, rhk, wstack)
    return out.reshape(b, length, c)


def _unfused_reference(x, skip, kernels, biases, conv_ws, conv_bs, hop):
    """The XLA path the kernel must match (models/fastdiff.py inner loop)."""
    layers = kernels.shape[2]
    dtype = x.dtype
    for i in range(layers):
        d = 3 ** i
        x = x + skip
        y = _leaky(x)
        pad = d
        yp = jnp.pad(y, ((0, 0), (pad, pad), (0, 0)))
        taps = [yp[:, k * d: k * d + y.shape[1]] for k in range(3)]
        w = conv_ws[i].astype(dtype)
        yc = sum(jnp.einsum("blc,co->blo", t, w[k],
                            preferred_element_type=jnp.float32)
                 for k, t in enumerate(taps))
        y = _leaky((yc + conv_bs[i]).astype(dtype))
        x = lvc_gated_residual(x, y, kernels[:, :, i].astype(dtype),
                               biases[:, :, i].astype(jnp.float32), hop)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def lvc_block_fused(x, skip, kernels, biases, conv_ws, conv_bs, hop: int,
                    interpret: bool = False):
    """Fused 4-layer LVC block.

    x, skip: (B, L, C); kernels (B, F, layers, K, C, 2C);
    biases (B, F, layers, 2C); conv_ws (layers, K, C, C) effective dilated
    conv weights; conv_bs (layers, C). L == F * hop. Requires hop >= 64
    (callers gate with ``fusable``).
    """
    kern_aug = augment_lvc_kernels(kernels.astype(x.dtype),
                                   biases.astype(x.dtype))
    wstack = stack_conv_weights(
        [w for w in conv_ws], [b for b in conv_bs], dtype=x.dtype)
    return _fused_call(x, skip, kern_aug, wstack, hop, interpret)


def _fwd(x, skip, kernels, biases, conv_ws, conv_bs, hop, interpret):
    out = lvc_block_fused(x, skip, kernels, biases, conv_ws, conv_bs, hop,
                          interpret)
    return out, (x, skip, kernels, biases, conv_ws, conv_bs)


def _bwd(hop, interpret, residuals, g):
    x, skip, kernels, biases, conv_ws, conv_bs = residuals
    _, vjp = jax.vjp(
        lambda *args: _unfused_reference(*args, hop), x, skip, kernels,
        biases, conv_ws, conv_bs)
    return vjp(g)


lvc_block_fused.defvjp(_fwd, _bwd)
