"""Fused Pallas TPU kernel for the gated LVC layer.

Computes, in one VMEM pass (vs. the XLA path's materialized (L, K*C) window
tensor + separate bias/gate/residual ops):

    z[b, f*hop+t, :] = windows(y)[f, t, :] @ kernel[b, f]  + bias[b, f]
    out = x + sigmoid(z[..., :C]) * tanh(z[..., C:])

where ``windows(y)`` are K=3 shifted taps of the zero-padded input
(semantics of reference modules.py:220-253 with dilation=1; see
fastdiff_tpu/ops/lvc.py for the XLA formulation and layout contract).

Mapping (shaped by Mosaic's constraints, found the hard way):
- all operands are reshaped frame-major on the host: (B, F, hop, C); the K
  shifted taps are separate inputs (cheap XLA slices of the padded signal).
  BlockSpec blocks cannot overlap and Mosaic rejects sublane-/lane-unaligned
  slices at C=32, which rules out halo DMA and in-kernel shifted slicing.
- grid = (B, F / TF), TF a multiple of 8 (bias block sublane rule).
- the bias is folded into the contraction: the kernel operand is augmented
  with 32 extra rows (row K*C holds the bias, the rest zero) and the window
  with a constant [1, 0, ...] block, making the contraction dim exactly 128
  lanes. A (TF, 1, 2C) broadcast bias-add SIGABRTs Mosaic, and this uses the
  MXU's otherwise-padded lanes for free.
- ONE batched MXU matmul per tile: (TF, hop, 128) x (TF, 128, 2C), batch
  dim = frames, so per-frame kernels need no loop.
- gate + residual run on the VPU before the single output write.
- hop < 64 falls back to the XLA path (`lvc_gated_residual`): those blocks
  run at L/32 sample rate where fusion wins little and (hop, C) tiles would
  be mostly padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastdiff_tpu.ops.lvc import lvc_gated_residual

_MIN_PALLAS_HOP = 64
_LANES = 128


def _kernel_body(k_ref, x_ref, *tap_and_out, k_taps: int, c_in: int,
                 aug: int):
    tap_refs = tap_and_out[:k_taps]
    out_ref = tap_and_out[k_taps]
    tf, hop, _ = tap_refs[0].shape[1:4] if False else (
        tap_refs[0].shape[1], tap_refs[0].shape[2], c_in)

    taps = [ref[0] for ref in tap_refs]            # each (TF, hop, C)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (tf, hop, aug), 2)
    ones_col = (lane_idx == 0).astype(taps[0].dtype)
    win = jnp.concatenate(taps + [ones_col], axis=-1)   # (TF, hop, 128)

    z = jax.lax.dot_general(
        win, k_ref[0],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)        # (TF, hop, 2C)
    gate = jax.nn.sigmoid(z[..., :c_in]) * jnp.tanh(z[..., c_in:])
    out_ref[0] = x_ref[0] + gate.astype(x_ref.dtype)


def _pick_tile_frames(n_frames: int, hop: int) -> int:
    """Frames per program: ~2-4k samples per tile, dividing n_frames.

    Must be a multiple of 8 (or the full frame count): tile_frames lands in
    sublane position for several blocks and Mosaic requires sublane-divisible
    block shapes unless the block covers the whole dimension.
    """
    target = max(8, 2048 // hop)
    candidates = [tf for tf in range(8, n_frames + 1, 8) if n_frames % tf == 0]
    if not candidates:
        return n_frames
    return min(candidates, key=lambda tf: abs(tf - target))


@functools.partial(jax.jit, static_argnames=("hop",))
def lvc_gated_pallas(x: jnp.ndarray, y: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Fused gated LVC: x, y (B, L, C); kernel (B, F, K, C, 2C);
    bias (B, F, 2C); returns x + sig/tanh-gated LVC(y). L == F*hop."""
    b, length, c = x.shape
    _, frames, k_taps, _, c_out = kernel.shape
    assert length == frames * hop, (length, frames, hop)

    aug = _LANES - k_taps * c
    if hop < _MIN_PALLAS_HOP or aug <= 0:
        return lvc_gated_residual(x, y, kernel, bias, hop)

    tile_frames = _pick_tile_frames(frames, hop)
    grid = (b, frames // tile_frames)

    pad = (k_taps - 1) // 2
    y_pad = jnp.pad(y, ((0, 0), (pad, pad), (0, 0)))
    taps = [jax.lax.slice_in_dim(y_pad, k, k + length, axis=1)
                .reshape(b, frames, hop, c)
            for k in range(k_taps)]
    x4 = x.reshape(b, frames, hop, c)

    # augment the kernel: row K*C carries the bias, rows K*C+1.. are zero
    kflat = kernel.reshape(b, frames, k_taps * c, c_out)
    ker_aug = jnp.concatenate([
        kflat,
        bias.astype(kflat.dtype)[:, :, None, :],
        jnp.zeros((b, frames, aug - 1, c_out), kflat.dtype),
    ], axis=2)                                      # (B, F, 128, 2C)

    sample_spec = pl.BlockSpec((1, tile_frames, hop, c),
                               lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel_body, k_taps=k_taps, c_in=c, aug=aug),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_frames, _LANES, c_out),
                         lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),          # aug kernels
            sample_spec,                                    # x
        ] + [sample_spec] * k_taps,                         # shifted taps
        out_specs=sample_spec,
        out_shape=jax.ShapeDtypeStruct((b, frames, hop, c), x.dtype),
    )(ker_aug, x4, *taps)
    return out.reshape(b, length, c)
