"""Fused down-path Pallas TPU kernel: first conv + all DiffusionDBlocks.

The denoiser's downsampling path (reference: FastDiff_model.py:89-93 +
modules.py:127-138; XLA formulation in models/fastdiff.py:fastdiff_apply /
_dblock_apply) is, per call at the bench shape, ~1.1 ms on the XLA path —
almost entirely HBM round trips: ~15 ops at (L, 32) / (L/4, 32) shapes,
each a full read+write of a 7-28 MB activation. The arithmetic is tiny
(first conv is 1->32ch k=7; everything else runs at <= L/4 rate), so one
kernel that keeps the whole chain in VMEM and only writes the four real
outputs (3 skip features + the final downsampled x) is bandwidth-ideal:

    audio (B, L, 1) -> skip0 (B, L, C)      x = conv_k7(audio)
                       skip1 (B, L/f2, C)   x = DBlock_f2(x)
                       skip2 (B, L/(f2 f1), C)  x = DBlock_f1(x)
                       xfin  (B, L/prod, C)     x = DBlock_f0(x)

with factors (f2, f1, f0) = reversed(cfg.upsample_ratios) and each DBlock =
nearest-downsample + 3 dilated convs (k=3, dil 1,2,4, leaky 0.2 before
each) + a 1x1-conv residual. The 1x1 residual conv commutes EXACTLY with
nearest subsampling (pointwise), so it runs at the downsampled rate.

Mapping (same scheme as ops/lvc_block_pallas.py):
- grid = (B, L / tile_in); halos are read through shifted, clamped
  BlockSpec index maps over the original audio (no HBM prep). halo_in
  covers the whole-path receptive field at input rate:
  3 + sum_blocks 7 * stride_in(block) < 2048 for the default (4,8,8)/C=32
  config.
- Sequence-edge parity: first/last tiles re-zero out-of-sequence rows
  before every conv (zero-padding semantics); interior tiles skip the
  masks (in-tile rolls are circular but the wrap stays inside the halo).
- All conv math is augmented-contraction MXU dots (taps + a ones column,
  bias carried as the final weight row), bf16 operands, f32 accumulation,
  bf16 layer outputs — bit-matching the XLA path's conv1d_dot policy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastdiff_tpu.ops import nn as fnn


def _leaky(x, slope=0.2):
    # max-form (valid for 0 < slope < 1): no bf16 vector compare on Mosaic
    return jnp.maximum(x, x * slope)


def pack_downpath_weights(params: dict, n_layers: int = 3, dtype=jnp.bfloat16):
    """Model params -> augmented weight operands for the kernel.

    Returns (first_aug (K0+1, C), res_aug (B?, C+1, C) stacked (nb, C+1, C),
    conv_aug (nb, n_layers, 3C+1, C)). Bias lives in the final contraction
    row of each operand; tap rows are k-major, matching the in-kernel
    concat order (identical to ops/lvc_block_pallas.stack_conv_weights).
    """
    wf = fnn.conv_weight(params["first_audio_conv"])        # (K0, 1, C)
    k0, _, c = wf.shape
    first_aug = jnp.concatenate(
        [wf.reshape(k0, c), params["first_audio_conv"]["b"][None, :]],
        axis=0).astype(dtype)                               # (K0+1, C)

    res_aug, conv_aug = [], []
    for blk in params["downsample"]:
        wr = fnn.conv_weight(blk["residual_dense"])         # (1, C, C)
        res_aug.append(jnp.concatenate(
            [wr.reshape(c, c), blk["residual_dense"]["b"][None, :]], axis=0))
        per_layer = []
        for conv in blk["convs"]:
            w = fnn.conv_weight(conv)                       # (3, C, C)
            per_layer.append(jnp.concatenate(
                [w.reshape(3 * c, c), conv["b"][None, :]], axis=0))
        conv_aug.append(jnp.stack(per_layer))
    return (first_aug, jnp.stack(res_aug).astype(dtype),
            jnp.stack(conv_aug).astype(dtype))              # (nb,C+1,C), (nb,l,3C+1,C)


def _kernel_body(ac, lha, rha, first_ref, res_ref, conv_ref,
                 s0_ref, s1_ref, s2_ref, xf_ref,
                 *, factors, c, k0, length, tile_in, halo_in, n_layers):
    ext = tile_in + 2 * halo_in
    ti = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    a = jnp.concatenate([lha[0], ac[0], rha[0]], axis=0)    # (E, 1) f32

    def _valid(rate):
        e_r = ext // rate
        gpos = (jax.lax.broadcasted_iota(jnp.int32, (e_r, 1), 0)
                + ti * (tile_in // rate) - halo_in // rate)
        return jnp.logical_and(gpos >= 0, gpos < length // rate)

    def _tap(y, offsets):
        """[y shifted by each offset..., ones] as one bf16-ish matrix."""
        yf = y.astype(jnp.float32)
        e = yf.shape[0]
        pieces = [pltpu.roll(yf, (-off) % e, 0) for off in offsets]
        pieces.append(jnp.ones((e, 1), jnp.float32))
        return jnp.concatenate(pieces, axis=1).astype(y.dtype)

    def _run(masked: bool):
        af = a.astype(jnp.bfloat16)
        if masked:
            af = jnp.where(_valid(1), af, jnp.zeros_like(af))
        # first conv: k0 taps at offsets -(k0//2)..k0//2 (k-major rows)
        half = (k0 - 1) // 2
        tap = _tap(af, range(-half, half + 1))              # (E, K0+1)
        x = jax.lax.dot(tap, first_ref[...],
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        if masked:
            x = jnp.where(_valid(1), x, jnp.zeros_like(x))
        outs = [x]

        rate = 1
        for bi, f in enumerate(factors):
            rate *= f
            e_r = ext // rate
            # nearest downsample == phase-0 strided pick (fnn.nearest_downsample)
            x = x.reshape(e_r, f, c)[:, 0, :]
            # 1x1 residual conv commutes with subsampling -> run at low rate
            rtap = jnp.concatenate(
                [x, jnp.ones((e_r, 1), x.dtype)], axis=1)   # (E_r, C+1)
            res = jax.lax.dot(rtap, res_ref[bi],
                              preferred_element_type=jnp.float32)
            y = x
            for li in range(n_layers):
                d = 2 ** li
                tap = _tap(_leaky(y), (-d, 0, d))           # (E_r, 3C+1)
                y = jax.lax.dot(tap, conv_ref[bi, li],
                                preferred_element_type=jnp.float32
                                ).astype(jnp.bfloat16)
                if masked:
                    y = jnp.where(_valid(rate), y, jnp.zeros_like(y))
            x = y + res.astype(jnp.bfloat16)   # bf16 add, matching conv1d_dot
            if masked:
                x = jnp.where(_valid(rate), x, jnp.zeros_like(x))
            outs.append(x)
        return outs

    outs = jax.lax.cond(jnp.logical_or(ti == 0, ti == n_tiles - 1),
                        lambda: _run(True), lambda: _run(False))

    rates = [1]
    for f in factors:
        rates.append(rates[-1] * f)
    for out_ref, val, rt in zip((s0_ref, s1_ref, s2_ref, xf_ref), outs, rates):
        h = halo_in // rt
        t = tile_in // rt
        out_ref[0] = val[h: h + t]


def required_halo(factors, k0: int = 7, n_layers: int = 3) -> int:
    """Whole-path receptive field at input rate, rounded up to a multiple
    of the final rate (so every stage's halo is an integer row count)."""
    rf = (k0 - 1) // 2
    rate, prod = 1, 1
    for f in factors:
        prod *= f
    for f in factors:
        rate *= f
        rf += (2 ** n_layers - 1) * rate          # dil 1+2+4 per block
    return -(-rf // prod) * prod


def downpath_fusable(length: int, factors) -> bool:
    """Kernel preconditions: >= 2 halo units and halo-aligned length."""
    halo = required_halo(factors)
    return length % halo == 0 and length // halo >= 2


def _pick_tile(length: int, halo_in: int) -> int:
    """Center-tile input samples: ~6 halo units (~12k), dividing length.

    Bigger tiles amortize the 2-halo recompute but the full-rate stage's
    (E, 1)/(E, taps) operands are lane-PADDED to 128 in VMEM (128x their
    logical bytes) — 12-unit tiles blow the Mosaic scoped-vmem stack."""
    units = length // halo_in
    divisors = [u for u in range(1, units + 1) if units % u == 0]
    return min(divisors, key=lambda u: abs(u - 6)) * halo_in


@functools.partial(jax.jit, static_argnames=("factors", "interpret"))
def _fused_call(audio, first_aug, res_aug, conv_aug, factors, interpret=False):
    b, length, _ = audio.shape
    k0 = first_aug.shape[0] - 1
    c = first_aug.shape[1]
    n_layers = conv_aug.shape[1]
    prod = 1
    for f in factors:
        prod *= f
    assert length % prod == 0, (length, prod)
    halo_in = required_halo(factors, k0, n_layers)
    assert downpath_fusable(length, factors), (length, halo_in)
    tile_in = _pick_tile(length, halo_in)
    n_tiles = length // tile_in
    r = tile_in // halo_in
    n_halo = length // halo_in
    grid = (b, n_tiles)

    a_spec = pl.BlockSpec((1, tile_in, 1), lambda bi, ti: (bi, ti, 0),
                          memory_space=pltpu.VMEM)

    def a_halo(side):
        def imap(bi, ti):
            if side == "l":
                return (bi, jnp.maximum(ti * r - 1, 0), 0)
            return (bi, jnp.minimum(ti * r + r, n_halo - 1), 0)
        return pl.BlockSpec((1, halo_in, 1), imap, memory_space=pltpu.VMEM)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda bi, ti: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    rates = [1]
    for f in factors:
        rates.append(rates[-1] * f)

    out_shapes = [jax.ShapeDtypeStruct((b, length // rt, c), jnp.bfloat16)
                  for rt in rates]
    out_specs = [
        pl.BlockSpec((1, tile_in // rt, c),
                     (lambda bi, ti: (bi, ti, 0)),
                     memory_space=pltpu.VMEM)
        for rt in rates]

    outs = pl.pallas_call(
        functools.partial(_kernel_body, factors=factors, c=c, k0=k0,
                          length=length, tile_in=tile_in, halo_in=halo_in,
                          n_layers=n_layers),
        grid=grid,
        in_specs=[a_spec, a_halo("l"), a_halo("r"),
                  w_spec(first_aug.shape), w_spec(res_aug.shape),
                  w_spec(conv_aug.shape)],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(audio, audio, audio, first_aug, res_aug, conv_aug)
    return tuple(outs)


def _unfused_reference(params, audio, factors, dtype=jnp.bfloat16):
    """The XLA composition the kernel must match (models/fastdiff.py)."""
    from fastdiff_tpu.models import fastdiff as M
    x = fnn.conv1d(params["first_audio_conv"], audio.astype(dtype),
                   compute_dtype=dtype)
    outs = [x]
    for blk, f in zip(params["downsample"], factors):
        x = M._dblock_apply(blk, x, f, dtype, impl="dot")
        outs.append(x)
    return tuple(outs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def downpath_fused(params, audio, factors: tuple, interpret: bool = False):
    """Fused first-conv + DBlock chain.

    params: the model's {"first_audio_conv", "downsample"} subtree (weight
    norm fused or not); audio (B, L, 1) f32; factors = the DOWNSAMPLE
    factor sequence, i.e. reversed(cfg.upsample_ratios).
    Returns [skip0, skip1, ..., x_final] (len(factors)+1 arrays, bf16).
    """
    first_aug, res_aug, conv_aug = pack_downpath_weights(params)
    return _fused_call(audio, first_aug, res_aug, conv_aug, tuple(factors),
                       interpret)


def _fwd(params, audio, factors, interpret):
    return downpath_fused(params, audio, factors, interpret), (params, audio)


def _bwd(factors, interpret, residuals, g):
    params, audio = residuals
    _, vjp = jax.vjp(
        lambda p, a: _unfused_reference(p, a, factors), params, audio)
    return vjp(tuple(g))


downpath_fused.defvjp(_fwd, _bwd)
