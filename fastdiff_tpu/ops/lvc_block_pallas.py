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
  sum(3^i) + LVC taps). Halo operands are read through SHIFTED BlockSpec
  index maps over the ORIGINAL arrays (H = max(hop, 48) samples each side)
  — nothing is padded, sliced, or re-tiled in HBM before the kernel. (The
  first version materialized 6 halo operands + layout copies per call;
  xplane traces showed that prep costing more than the kernel itself —
  docs/PERF.md.) Edge tiles clamp the halo index into bounds; the garbage
  rows this loads are exactly the out-of-sequence positions the validity
  mask re-zeros.
- Sequence-edge parity: the unfused path zero-pads EVERY conv/LVC input at
  the true sequence edges; a validity mask (global position in [0, L))
  re-zeros the carry and the conv output each layer so halo garbage can't
  leak in — bit-exact edge semantics, not just interior parity.
- Both matmuls ride one augmented (3C+1)-row contraction: tap matrices get
  a constant one-column at lane 3C and the weight operands carry the bias
  in that row, so bias-add is free MXU work. (Round 1 padded the
  contraction to 128 rows; the compact 3C+1 form carries 24% less kernel
  memory and lets the predictor emit the operand directly.)
    conv:  (E, 3C+1) @ (3C+1, C)                E = (TF + 2) * hop samples
    LVC:   (Fe, hop, 3C+1) @ (Fe, 3C+1, 2C)     Fe = E / hop frames
- hop < 64 (the first, T/32-rate block) falls back to the XLA path: those
  tiles would be mostly padding and carry ~3% of the sample work.
- In-kernel shifts are ``pltpu.roll`` routed through f32 (Mosaic has no
  bf16 rotate) and leaky_relu is max-form (no bf16 vector compare).

Entry points:
- ``lvc_block_fused(x, skip, kernels, biases, conv_ws, conv_bs, hop)``:
  takes the predictor's natural (B,F,layers,K,C,2C) kernels and augments
  them at trace time. Custom VJP recomputes through the unfused XLA path.
- ``lvc_block_fused_aug(x, skip, kern_aug, wstack, hop)``: takes the
  operand in augmented (B,F,layers,3C+1,2C) layout directly — the
  inference fast path when the kernel predictor emits this layout
  (models/fastdiff.py builds the augmented head from kernel_conv+bias_conv
  at trace time). Also carries a VJP (reconstructs kernels from the
  augmented rows, recomputes unfused).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastdiff_tpu.ops.lvc import lvc_gated_residual

_MIN_FUSED_HOP = 64
_MIN_HALO = 48          # >= 44-sample receptive field, multiple of 8


def aug_rows(c: int, k: int = 3) -> int:
    """Contraction rows of the augmented operands: K*C taps + 1 bias row."""
    return k * c + 1


def _leaky(x, slope=0.2):
    # max-form leaky relu (valid for 0 < slope < 1): Mosaic has no bf16
    # vector compare ("Target does not support this comparison"), but
    # bf16 maximum lowers fine.
    return jnp.maximum(x, x * slope)


def _kernel_body(xc, lhx, rhx, skc, lhs, rhs, kc, lhk, rhk, wstack, out_ref,
                 *, hop: int, layers: int, c: int, length: int,
                 tile_s: int, halo: int, lvc_unroll: bool):
    ext_e = tile_s + 2 * halo
    fe = ext_e // hop
    ti = pl.program_id(1)

    carry = jnp.concatenate([lhx[0], xc[0], rhx[0]], axis=0)
    skip = jnp.concatenate([lhs[0], skc[0], rhs[0]], axis=0)
    kern = jnp.concatenate([lhk[0], kc[0], rhk[0]], axis=0)

    gpos = (jax.lax.broadcasted_iota(jnp.int32, (ext_e, 1), 0)
            + ti * tile_s - halo)
    valid = jnp.logical_and(gpos >= 0, gpos < length)        # (E, 1)
    ones = jnp.ones((ext_e, 1), carry.dtype)                 # bias column

    def _roll(arr, shift):
        # pltpu.roll wants a non-negative shift, and Mosaic's tpu.dynamic_
        # rotate only supports 32-bit element types — route bf16 through f32.
        # (Measured: batching the casts around a single f32 concat, and
        # gating the masks behind an edge-tile lax.cond, were both SLOWER —
        # slope-timed A/B 2026-08-17; this per-roll form is the fastest
        # variant found.)
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
            [_roll(y, d), y, _roll(y, -d), ones], axis=1)
        y = jax.lax.dot(tap, wstack[i],
                        preferred_element_type=jnp.float32)
        y = _leaky(y).astype(carry.dtype)
        y = jnp.where(valid, y, jnp.zeros_like(y))

        tap = jnp.concatenate(
            [_roll(y, 1), y, _roll(y, -1), ones], axis=1)
        win = tap.reshape(fe, hop, aug_rows(c))
        if lvc_unroll:
            z = jnp.stack([
                jax.lax.dot(win[f], kern[f, i],
                            preferred_element_type=jnp.float32)
                for f in range(fe)])                         # (Fe, hop, 2C)
        else:
            z = jax.lax.dot_general(
                win, kern[:, i],
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # (Fe, hop, 2C)
        gate = jax.nn.sigmoid(z[..., :c]) * jnp.tanh(z[..., c:])
        carry = s + gate.reshape(ext_e, c).astype(s.dtype)

    out_ref[0] = carry[halo: halo + tile_s]


def _pick_tile_frames(n_frames: int, hop: int) -> int:
    """Frames per program: ~8k center samples, dividing n_frames.

    Bigger tiles amortize the per-program halo recompute (halo is one
    frame each side at hop>=64: 25% extra rows at 2k tiles, 6% at 8k) and
    the Mosaic program overhead; slope-timed A/B picked 8k over 2k/4k/16k.
    """
    target = max(1, 8192 // hop)
    divisors = [tf for tf in range(1, n_frames + 1) if n_frames % tf == 0]
    return min(divisors, key=lambda tf: abs(tf - target))


def stack_conv_weights(conv_ws, conv_bs, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Dilated-conv weights+biases -> augmented (layers, 3C+1, C) operand.

    Rows [0, 3C) are the (K=3, C, C) taps flattened tap-major (matching the
    kernel's tap concat order), row 3C is the bias.
    """
    ws = jnp.stack([w.reshape(-1, w.shape[-1]) for w in conv_ws])  # (l,3C,C)
    bs = jnp.stack(conv_bs)                                        # (l, C)
    return jnp.concatenate([ws, bs[:, None, :]], axis=1).astype(dtype)


def augment_lvc_kernels(kernels: jnp.ndarray, biases: jnp.ndarray) -> jnp.ndarray:
    """(B,F,l,K,C,2C) kernels + (B,F,l,2C) biases -> (B,F,l,K*C+1,2C) with
    the bias in the final contraction row."""
    b, f, layers, k, c, c2 = kernels.shape
    kflat = kernels.reshape(b, f, layers, k * c, c2)
    return jnp.concatenate(
        [kflat, biases[..., None, :].astype(kflat.dtype)], axis=3)


def split_aug_kernels(kern_aug: jnp.ndarray, k: int = 3):
    """Inverse of ``augment_lvc_kernels``: -> (kernels, biases)."""
    b, f, layers, rows, c2 = kern_aug.shape
    c = (rows - 1) // k
    kernels = kern_aug[..., : k * c, :].reshape(b, f, layers, k, c, c2)
    biases = kern_aug[..., k * c, :]
    return kernels, biases


def fusable(hop: int, n_frames: int) -> bool:
    return hop >= _MIN_FUSED_HOP and n_frames >= 2


@functools.partial(jax.jit, static_argnames=("hop", "interpret",
                                             "tile_frames", "lvc_unroll"))
def _fused_call(x, skip, kern_aug, wstack, hop: int, interpret: bool = False,
                tile_frames: int | None = None,
                lvc_unroll: bool | None = None):
    b, length, c = x.shape
    _, frames, layers, rows, c2 = kern_aug.shape
    assert length == frames * hop, (length, frames, hop)
    assert rows == aug_rows(c), (rows, c)

    tf = tile_frames if tile_frames else _pick_tile_frames(frames, hop)
    n_tiles = frames // tf
    tile_s = tf * hop
    halo = max(hop, _MIN_HALO)            # frame-aligned (hop >= 64 here)
    hf = halo // hop
    r = tile_s // halo                    # halo-units per tile
    rk = tf // hf
    n_halo_x = length // halo
    n_halo_k = frames // hf
    grid = (b, n_tiles)

    x_spec = pl.BlockSpec((1, tile_s, c), lambda bi, ti: (bi, ti, 0),
                          memory_space=pltpu.VMEM)

    def x_halo(side):
        def imap(bi, ti):
            if side == "l":
                return (bi, jnp.maximum(ti * r - 1, 0), 0)
            return (bi, jnp.minimum(ti * r + r, n_halo_x - 1), 0)
        return pl.BlockSpec((1, halo, c), imap, memory_space=pltpu.VMEM)

    k_spec = pl.BlockSpec((1, tf, layers, rows, c2),
                          lambda bi, ti: (bi, ti, 0, 0, 0),
                          memory_space=pltpu.VMEM)

    def k_halo(side):
        def imap(bi, ti):
            if side == "l":
                return (bi, jnp.maximum(ti * rk - 1, 0), 0, 0, 0)
            return (bi, jnp.minimum(ti * rk + rk, n_halo_k - 1), 0, 0, 0)
        return pl.BlockSpec((1, hf, layers, rows, c2), imap,
                            memory_space=pltpu.VMEM)

    wspec = pl.BlockSpec((layers, rows, c), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM)

    if lvc_unroll is None:
        # unrolled per-frame dots beat batched dot_general 2x in ISOLATION
        # (bench_mosaic_micro) but measure the same inside the full kernel
        # and balloon VMEM stack; default to the batched lowering
        lvc_unroll = False
    out = pl.pallas_call(
        functools.partial(_kernel_body, hop=hop, layers=layers, c=c,
                          length=length, tile_s=tile_s, halo=halo,
                          lvc_unroll=lvc_unroll),
        grid=grid,
        in_specs=[x_spec, x_halo("l"), x_halo("r"),
                  x_spec, x_halo("l"), x_halo("r"),
                  k_spec, k_halo("l"), k_halo("r"), wspec],
        out_specs=pl.BlockSpec((1, tile_s, c), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, length, c), x.dtype),
        # 8k-sample tiles + unrolled LVC dots exceed Mosaic's default 16 MB
        # scoped-vmem stack limit; v5e has 128 MB VMEM — allow 96 MB
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )(x, x, x, skip, skip, skip, kern_aug, kern_aug, kern_aug, wstack)
    return out


def _head_mm_body(x_ref, w_ref, b_ref, out_ref):
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = (acc + b_ref[...]).astype(out_ref.dtype)


def _head_mm5d_body(x_ref, w_ref, b_ref, out_ref):
    acc = jnp.dot(x_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    acc = (acc + b_ref[...]).astype(out_ref.dtype)
    mt = acc.shape[0]
    _, cout, rows = out_ref.shape[1:]
    out_ref[:, 0] = acc.reshape(mt, cout, rows)


# Grid order for taug_head_matmul_5d, read at TRACE time.  True iterates
# (layers, m_tiles) with m innermost, so the (K, cout*rows) head-weight slab
# (~3.1 MB at production width) stays VMEM-resident across all m tiles and
# is fetched once per layer instead of once per grid step — the "w-resident
# grid ordering" lever named in the r4 trace table (docs/PERF.md): at
# m=896/m_tile=224 it cuts the head's weight reads ~4x (50 -> 12.6 MB/call).
TAUG_HEAD_W_RESIDENT = True


def _taug5d_m_tile(m: int) -> int:
    # prefer an exact divisor of m (multiple of 8, <= 256) so no grid cell
    # runs partial; the f32 (m_tile, cout*rows) accumulator bounds the tile
    # (256 x 8192 x 4 = 8 MB at production width)
    best = 0
    for t in range(8, min(m, 256) + 1, 8):
        if m % t == 0:
            best = t
    return best or min(m, 216)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def taug_head_matmul_5d(tap_c, w_head, b_head, layers: int, cout: int,
                        rows: int, interpret: bool = False):
    """Kernel-predictor head matmul that emits the NCL megakernel's operand
    in its CANONICAL tiled layout: (M, layers, cout, rows) with (cout, rows)
    as the tiled minor dims.

    A plain matmul emits (M, layers*cout*rows) with frames in sublanes;
    feeding that to the megakernel (whose Pallas operands must be
    default-layout) makes XLA materialize a relayout copy of the model's
    largest activation — 0.43 ms/block at b=1 and a super-linear 2.76 ms at
    b=4 (r4 device traces). Here each grid cell computes one (m_tile,
    cout*rows) layer slab and retiles it in-register on the way out
    (Mosaic reshape, slope-timed at ~455 GB/s — the copy never exists).

    Requires rows % 128 == 0 and cout % 8 == 0 (the padded taug head
    guarantees rows; cout = 2*inner_channels).
    """
    m, k = tap_c.shape
    n_slab = cout * rows
    # small m-tiles: the f32 accumulator is (m_tile, cout*rows) on the
    # kernel stack (256 x 8192 x 4 = 8 MB at the production width; 864
    # blew the 29.5 MB scoped-vmem limit)
    m_tile = _taug5d_m_tile(m)
    if TAUG_HEAD_W_RESIDENT:
        # m innermost: the weight slab's block index (0, li) only changes on
        # the outer step, so Pallas fetches it layers times, not every step
        grid = (layers, pl.cdiv(m, m_tile))
        ix, iw, io = (lambda li, mi: (mi, 0)), (lambda li, mi: (0, li)), \
            (lambda li, mi: (mi, li, 0, 0))
    else:
        grid = (pl.cdiv(m, m_tile), layers)
        ix, iw, io = (lambda mi, li: (mi, 0)), (lambda mi, li: (0, li)), \
            (lambda mi, li: (mi, li, 0, 0))
    return pl.pallas_call(
        _head_mm5d_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, k), ix, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n_slab), iw, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_slab), iw, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, 1, cout, rows), io,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, layers, cout, rows), tap_c.dtype),
        interpret=interpret,
    )(tap_c, w_head, b_head.reshape(1, layers * n_slab).astype(jnp.float32))


def _taug5d_fwd(tap_c, w_head, b_head, layers, cout, rows, interpret):
    out = taug_head_matmul_5d(tap_c, w_head, b_head, layers, cout, rows,
                              interpret)
    return out, (tap_c, w_head, b_head)


def _taug5d_bwd(layers, cout, rows, interpret, residuals, g):
    # plain matmul VJP on the flattened view (training-path only; the
    # canonical-layout emission is an inference perf feature)
    tap_c, w_head, b_head = residuals
    gf = g.reshape(g.shape[0], -1)
    dx = jnp.dot(gf, w_head.T.astype(gf.dtype),
                 preferred_element_type=jnp.float32).astype(tap_c.dtype)
    dw = jnp.dot(tap_c.T, gf.astype(tap_c.dtype),
                 preferred_element_type=jnp.float32).astype(w_head.dtype)
    db = (jnp.sum(gf, axis=0, dtype=jnp.float32)
          .reshape(b_head.shape).astype(b_head.dtype))
    return dx, dw, db


taug_head_matmul_5d.defvjp(_taug5d_fwd, _taug5d_bwd)


def _head_n_tile(n: int, cap: int = 2048) -> int:
    """Largest divisor of n that is a multiple of 128 and <= cap."""
    best = 0
    for t in range(128, cap + 1, 128):
        if n % t == 0:
            best = t
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def aug_head_matmul(tap_c, w_head, b_head, interpret: bool = False):
    """Row-major-emitting matmul for the kernel-predictor head.

    tap_c (M, K) bf16 @ w_head (K, N) bf16 + b_head (N,) f32 -> (M, N) bf16
    written in ROW-MAJOR layout — which, reshaped to (B, F, layers, 3C+1,
    2C), is byte-identical to the megakernel's kern_aug operand. XLA's own
    dot chose an M-minor output layout here (the trunk runs at thin-channel
    shapes), forcing f32 relayout copies of the model's largest activation
    (~1.5 ms per block-call, xplane-traced); a pallas_call's operands and
    results are always default row-major, so producing the operand inside
    one makes the whole head->megakernel hand-off copy-free.
    """
    m, k = tap_c.shape
    _, n = w_head.shape
    n_tile = _head_n_tile(n)
    if not n_tile:
        # no 128-multiple tile divides N (non-production widths, e.g. tiny
        # test configs): plain XLA dot — the row-major emission only
        # matters for perf at production shapes
        y = jnp.dot(tap_c, w_head, preferred_element_type=jnp.float32)
        return (y + b_head).astype(tap_c.dtype)
    m_tile = m if m <= 1024 else _head_n_tile(m, 1024) or 1024
    grid = (pl.cdiv(m, m_tile), n // n_tile)
    return pl.pallas_call(
        _head_mm_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, k), lambda mi, ni: (mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n_tile), lambda mi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda mi, ni: (0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n_tile), lambda mi, ni: (mi, ni),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), tap_c.dtype),
        interpret=interpret,
    )(tap_c, w_head, b_head.reshape(1, n).astype(jnp.float32))


def _aug_head_fwd(tap_c, w_head, b_head, interpret):
    out = aug_head_matmul(tap_c, w_head, b_head, interpret)
    return out, (tap_c, w_head, b_head)


def _aug_head_bwd(interpret, residuals, g):
    # plain matmul VJP (the row-major emission is an inference perf feature;
    # the NWC-fused TRAINING route differentiates through this head)
    tap_c, w_head, b_head = residuals
    dx = jnp.dot(g, w_head.T.astype(g.dtype),
                 preferred_element_type=jnp.float32).astype(tap_c.dtype)
    dw = jnp.dot(tap_c.T, g.astype(tap_c.dtype),
                 preferred_element_type=jnp.float32).astype(w_head.dtype)
    db = (jnp.sum(g, axis=0, dtype=jnp.float32)
          .reshape(b_head.shape).astype(b_head.dtype))
    return dx, dw, db


aug_head_matmul.defvjp(_aug_head_fwd, _aug_head_bwd)


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
    """Fused 4-layer LVC block from naturally-shaped operands.

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lvc_block_fused_aug(x, skip, kern_aug, wstack, hop: int,
                        interpret: bool = False):
    """Fused block from pre-augmented operands — the zero-prep inference
    path (the kernel predictor emits ``kern_aug`` directly; ``wstack`` from
    ``stack_conv_weights``)."""
    return _fused_call(x, skip, kern_aug.astype(x.dtype),
                       wstack.astype(x.dtype), hop, interpret)


def _unfused_from_aug(x, skip, kern_aug, wstack, hop):
    kernels, biases = split_aug_kernels(kern_aug)
    c = x.shape[-1]
    conv_ws = wstack[:, : 3 * c].reshape(wstack.shape[0], 3, c, c)
    conv_bs = wstack[:, 3 * c]
    return _unfused_reference(x, skip, kernels, biases.astype(jnp.float32),
                              conv_ws, conv_bs.astype(jnp.float32), hop)


def _aug_fwd(x, skip, kern_aug, wstack, hop, interpret):
    out = lvc_block_fused_aug(x, skip, kern_aug, wstack, hop, interpret)
    return out, (x, skip, kern_aug, wstack)


def _aug_bwd(hop, interpret, residuals, g):
    x, skip, kern_aug, wstack = residuals
    _, vjp = jax.vjp(
        lambda *args: _unfused_from_aug(*args, hop), x, skip, kern_aug,
        wstack)
    return vjp(g)


lvc_block_fused_aug.defvjp(_aug_fwd, _aug_bwd)
