"""Whole-LVC-block fused Pallas kernel, NCL (time-in-lanes) formulation.

Round-3 successor to ``ops/lvc_block_pallas.py`` (the round-2 NWC
megakernel).  Motivation, from the b=1 device trace + compiled-HLO audit
(scripts/exp_trace_sampler.py, scripts/exp_layout.py): ~40% of sampler
device time is relayout copies/reshapes around the LVC einsum boundaries —
XLA lays the big activations time-in-lanes ({1,2,0}) for full-lane
elementwise, while the NWC batched dots demand channel-minor operands, so
every layer round-trips layouts (~1.2 GB logical copy traffic per forward).
The round-2 NWC kernel killed the HBM round trips but paid an equivalent
in-kernel tax: at (E, 32) shapes every Mosaic VPU pass is lane-padded
128/32 = 4x physical bytes (docs/PERF.md "fused-kernel status").

This kernel transposes the world instead: in-kernel tensors are
``(channels, time)`` with TIME IN LANES —

- every elementwise op (leaky, gates, masks, residual) runs at full 128
  lanes with physical bytes == logical bytes;
- tap construction is lane-rolls of (32, E) arrays (f32-routed: Mosaic
  rotate is 32-bit only) — ~4x cheaper physically than the NWC kernel's
  (E, 128-padded) rolls;
- the dilated conv is ``w_aug (C, 3C+1) @ tap (3C+1, E)`` — one MXU dot
  with N = time = lanes;
- the per-frame LVC is an unrolled loop of ``kern_f (2C, 3C+1) @
  win (3C+1, hop)`` dots over aligned lane slices (hop = 256 = 2 lane
  tiles), no window tensor ever materialized;
- gate channels are SUBLANE slices (z[:C], z[C:]) — free, no relayout;
- bias rides the augmented contraction (ones row in the tap, bias column
  in the kernel operand), as in the round-2 kernel.

Same loop semantics as the XLA path (models/fastdiff.py:_lvc_block_apply,
reference modules/FastDiff/module/modules.py:208-217) with bit-exact edge
handling via validity masks.  Halos via shifted BlockSpec index maps over
the original arrays (nothing pre-materialized in HBM).

Interface is the transposed twin of ``lvc_block_fused_aug``:

    lvc_block_ncl_aug(x, skip, kern_taug, wstack_t, hop)
      x, skip:    (B, C, L)          bf16, time-minor
      kern_taug:  (B, F, layers, 2C, 3C+1)  bf16 (bias in last column)
      wstack_t:   (layers, C, 3C+1)  bf16 (conv bias in last column)
      -> (B, C, L)

``from_nwc``/``to_nwc`` helpers adapt the production NWC world for A/B
testing; the fast path is to emit kern_taug straight from the predictor
head and keep up-path activations NCL.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MIN_FUSED_HOP = 8
_MIN_HALO = 48

# Blocks with hop <= FH_MAX_HOP run the predictor head INSIDE the megakernel
# (lvc_block_ncl_fh) even under the plain "ncl" policy.  The r4 device trace
# showed each block paying ~0.14 ms/step of kern_taug HBM traffic (the head
# writes ~57 MB, the megakernel re-reads it — operand size depends on frame
# count, not hop, so the hop-8 block pays the same traffic as the full-rate
# block for 1/32 of the compute: 0.508 ms/sampler vs block 2's 1.387).
# All-blocks fh LOST the sampler A/B (6.60 vs 7.23 ms, two sessions): at
# hop 256 the tile has only ~34 frames, so the in-kernel head dots run at
# M=34 of 128 MXU rows and cost more than the traffic they save.  At hop 8
# the tile carries ~176 frames (M=176, efficient) and the block is
# traffic-bound, so fusing the head there is the win without the loss.
FH_MAX_HOP = 8
# Largest batch the hop<=FH_MAX_HOP fused head applies to under the plain
# "ncl" policy (trace-time knob, same contract as the fnn batch-policy
# globals).  0 = never: the r4 gate (fh at b=1, decided at +0.14 ms on
# 3-of-4 reps in a noisy session) did NOT survive re-measurement — the r5c
# 8-rep interleaved A/B read the unfused path -0.29 ms median (5/8 reps
# faster) and the r5g DEVICE TRACE confirmed it per-op: unfused scan
# 5.479 ms vs fused 5.549 (aug 0.508 + separate head beats fh 0.930; at
# b=1 the hop-8 kern_taug operand is small enough that the traffic saved
# no longer pays for the in-kernel head's extra pass).  The explicit
# "ncl_fh" policy still fuses the head for every fusable block.
FH_MAX_B = 0


def aug_rows(c: int, k: int = 3) -> int:
    return k * c + 1


def _leaky(x, slope=0.2):
    return jnp.maximum(x, x * slope)


def _roll_lanes(arr, shift):
    """Circular shift along the lane (time) axis; Mosaic rotate is 32-bit
    only, so bf16 routes through f32.  At (C, E) shapes this is a
    full-lane pass: physical bytes == logical bytes."""
    n = arr.shape[-1]
    if arr.dtype == jnp.float32:
        return pltpu.roll(arr, shift % n, 1)
    return pltpu.roll(arr.astype(jnp.float32), shift % n, 1).astype(arr.dtype)


def _compute_kern_slabs(tc, w_head, b_head, *, layers: int, c: int,
                        rows_p: int, tf: int, hf: int, n_frames: int):
    """In-kernel fused predictor head: trunk taps (F_e, K) @ per-layer head
    weights (K, 2C*rows_p) + bias -> list of (F_e, 2C, rows_p) bf16 kernel
    slabs.  Replaces the HBM round trip of the model's largest activation
    (the 5D kern_taug operand: ~59 MB written by the standalone head +
    ~59 MB re-read by the megakernel, per block call at bench shapes) with
    a recompute from the tiny resident trunk operand (F, K = 192).  Same
    math as taug_head_matmul_5d (f32 accumulate + bias, then cast) —
    bit-exact parity with the unfused head.

    ``tc`` is the FULL (1, hfa + F + hfa, K) tap ref, zero-padded with
    ``hfa = ceil(hf / 8) * 8`` frames each side (a per-frame halo BlockSpec
    would need 8-divisible frame blocks, which hf = 1-2 is not, and Mosaic
    must statically prove every dynamic sublane start is 8-aligned — so no
    clamped starts either).  With the padding, every load start is
    ``ti * tf + const`` with tf % 8 == 0: provably aligned, always
    in-bounds.  Zero-pad edge halos produce garbage kernel slabs exactly
    where the validity masks re-zero the carry — the same contract as the
    clamped x/skip halo BlockSpecs."""
    del n_frames
    hfa = -(-hf // 8) * 8
    ti = pl.program_id(1)
    base = ti * tf
    lh = tc[0, pl.ds(base, hfa)][hfa - hf:] if hfa != hf \
        else tc[0, pl.ds(base, hfa)]
    center = tc[0, pl.ds(base + hfa, tf)]                         # (tf, K)
    rh = tc[0, pl.ds(base + hfa + tf, hfa)][:hf]
    tap = jnp.concatenate([lh, center, rh], axis=0)               # (F_e, K)
    cout = 2 * c
    n_slab = cout * rows_p
    slabs = []
    for i in range(layers):
        w_i = w_head[:, i * n_slab: (i + 1) * n_slab]             # (K, n_slab)
        b_i = b_head[:, i * n_slab: (i + 1) * n_slab]             # (1, n_slab)
        acc = jax.lax.dot_general(
            tap, w_i, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = (acc + b_i).astype(tap.dtype)                       # (F_e, n_slab)
        slabs.append(acc.reshape(tap.shape[0], cout, rows_p))
    return slabs


def _kernel_body_fh(xc, lhx, rhx, skc, lhs, rhs, tc, w_head,
                    b_head, wstack, out_ref, *, hop: int, layers: int,
                    c: int, length: int, tile_s: int, halo: int,
                    rows_p: int, tf: int, hf: int, n_frames: int):
    kern = _compute_kern_slabs(tc, w_head, b_head, layers=layers,
                               c=c, rows_p=rows_p, tf=tf, hf=hf,
                               n_frames=n_frames)
    _kernel_core(xc, lhx, rhx, skc, lhs, rhs, None, None, None, wstack,
                 out_ref, hop=hop, layers=layers, c=c, length=length,
                 tile_s=tile_s, halo=halo, kern_slabs=kern)


def _kernel_body_fh_final(xc, lhx, rhx, skc, lhs, rhs, tc, w_head,
                          b_head, wstack, wfin, out_ref, fin_ref, *,
                          hop: int, layers: int, c: int, length: int,
                          tile_s: int, halo: int, rows_p: int, tf: int,
                          hf: int, n_frames: int):
    kern = _compute_kern_slabs(tc, w_head, b_head, layers=layers,
                               c=c, rows_p=rows_p, tf=tf, hf=hf,
                               n_frames=n_frames)
    carry = _kernel_core(xc, lhx, rhx, skc, lhs, rhs, None, None, None,
                         wstack, out_ref, hop=hop, layers=layers, c=c,
                         length=length, tile_s=tile_s, halo=halo,
                         kern_slabs=kern)
    _final_conv_epilogue(carry, wfin, fin_ref, length=length, tile_s=tile_s,
                         halo=halo)


def _final_conv_epilogue(carry, wfin, fin_ref, *, length: int, tile_s: int,
                         halo: int):
    """The model's k=7, C->1 output projection on the resident carry
    (see _kernel_body_final)."""
    ext_e = tile_s + 2 * halo
    ti = pl.program_id(1)
    gpos = (jax.lax.broadcasted_iota(jnp.int32, (1, ext_e), 1)
            + ti * tile_s - halo)
    valid = jnp.logical_and(gpos >= 0, gpos < length)
    cm = jnp.where(valid, carry, jnp.zeros_like(carry)).astype(jnp.float32)
    w = wfin[...].astype(jnp.float32)                     # (8, c)
    acc = None
    for tap in range(7):
        shifted = pltpu.roll(cm, (3 - tap) % ext_e, 1)
        term = shifted * w[tap][:, None]
        acc = term if acc is None else acc + term
    fc = jnp.sum(acc, axis=0, keepdims=True) + w[7, 0]    # (1, E)
    fin_ref[0] = fc[:, halo: halo + tile_s]


def _kernel_body_final(xc, lhx, rhx, skc, lhs, rhs, kc, lhk, rhk, wstack,
                       wfin, out_ref, fin_ref, *, hop: int, layers: int,
                       c: int, length: int, tile_s: int, halo: int):
    """``_kernel_body`` + fused final-conv epilogue (the model's k=7, C->1
    output projection).  As a standalone op the degenerate-output conv costs
    0.56 ms/sampler at b=1 (2.2 at b=4) in 1D T(1024) layouts; in-kernel it
    is 7 lane-rolls + a sublane reduction on the already-resident carry.
    ``wfin`` is (8, c): rows 0..6 the taps, row 7 broadcasting the bias."""
    carry = _kernel_core(xc, lhx, rhx, skc, lhs, rhs, kc, lhk, rhk, wstack,
                         out_ref, hop=hop, layers=layers, c=c, length=length,
                         tile_s=tile_s, halo=halo)
    _final_conv_epilogue(carry, wfin, fin_ref, length=length, tile_s=tile_s,
                         halo=halo)


def _kernel_body(xc, lhx, rhx, skc, lhs, rhs, kc, lhk, rhk, wstack, out_ref,
                 *, hop: int, layers: int, c: int, length: int,
                 tile_s: int, halo: int):
    _kernel_core(xc, lhx, rhx, skc, lhs, rhs, kc, lhk, rhk, wstack, out_ref,
                 hop=hop, layers=layers, c=c, length=length, tile_s=tile_s,
                 halo=halo)


def _kernel_body_sr(xc, lhx, rhx, skc, lhs, rhs, kc, lhk, rhk, wstack,
                    out_ref, s_ref, y_ref, z_ref, *, hop: int, layers: int,
                    c: int, length: int, tile_s: int, halo: int):
    """``_kernel_body`` + saved-residual emission for the training VJP:
    per layer, the center slices of s (post skip-add, pre-leaky), y (the
    post-conv post-leaky features feeding the LVC) and z (the pre-gate LVC
    output) are written to HBM so the backward never recomputes the
    forward (see ``lvc_block_ncl_taug_sr``)."""
    _kernel_core(xc, lhx, rhx, skc, lhs, rhs, kc, lhk, rhk, wstack, out_ref,
                 hop=hop, layers=layers, c=c, length=length, tile_s=tile_s,
                 halo=halo, res_refs=(s_ref, y_ref, z_ref))


def _kernel_core(xc, lhx, rhx, skc, lhs, rhs, kc, lhk, rhk, wstack, out_ref,
                 *, hop: int, layers: int, c: int, length: int,
                 tile_s: int, halo: int, kern_slabs=None, res_refs=None):
    ext_e = tile_s + 2 * halo
    fe = ext_e // hop
    ti = pl.program_id(1)

    carry = jnp.concatenate([lhx[0], xc[0], rhx[0]], axis=1)      # (C, E)
    skip = jnp.concatenate([lhs[0], skc[0], rhs[0]], axis=1)      # (C, E)
    rows = aug_rows(c)
    if kern_slabs is not None:
        # fused-head path: per-layer (Fe, 2C, rows_p) slabs computed
        # in-kernel from the trunk operand (_compute_kern_slabs)
        kern = None
        slabs = [s[..., :rows] if s.shape[-1] != rows else s
                 for s in kern_slabs]
    else:
        kern = jnp.concatenate([lhk[0], kc[0], rhk[0]], axis=0)   # (Fe,l,2C,R)
        if kern.shape[-1] != rows:
            # 128-row padded operand (the head emits it byte-exactly, no
            # relayout); the tail rows are zeros — slice back to 3C+1
            kern = kern[..., :rows]

    gpos = (jax.lax.broadcasted_iota(jnp.int32, (1, ext_e), 1)
            + ti * tile_s - halo)
    valid = jnp.logical_and(gpos >= 0, gpos < length)             # (1, E)
    ones = jnp.ones((1, ext_e), carry.dtype)

    for i in range(layers):
        d = 3 ** i
        s = carry + skip
        s = jnp.where(valid, s, jnp.zeros_like(s))
        y = _leaky(s)
        tap = jnp.concatenate(
            [_roll_lanes(y, d), y, _roll_lanes(y, -d), ones], axis=0)
        y = jax.lax.dot_general(
            wstack[i], tap, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                   # (C, E)
        y = _leaky(y).astype(carry.dtype)
        y = jnp.where(valid, y, jnp.zeros_like(y))

        tap = jnp.concatenate(
            [_roll_lanes(y, 1), y, _roll_lanes(y, -1), ones], axis=0)
        k_i = slabs[i] if kern_slabs is not None else kern[:, i]  # (Fe,2C,R)
        zs = []
        for f in range(fe):
            win = jax.lax.slice_in_dim(tap, f * hop, (f + 1) * hop, axis=1)
            zs.append(jax.lax.dot_general(
                k_i[f], win, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))              # (2C, hop)
        z = jnp.concatenate(zs, axis=1)                           # (2C, E)
        gate = jax.nn.sigmoid(z[:c]) * jnp.tanh(z[c:])
        if res_refs is not None:
            s_ref, y_ref, z_ref = res_refs
            ctr = slice(halo, halo + tile_s)
            s_ref[0, i] = s[:, ctr]
            y_ref[0, i] = y[:, ctr]
            z_ref[0, i] = z[:, ctr].astype(s.dtype)
        carry = s + gate.astype(s.dtype)

    out_ref[0] = carry[:, halo: halo + tile_s]
    return carry


# Samples per megakernel tile (trace-time knob; exp harnesses sweep it).
# ~8k is the production default for the aug (HBM-kern) path; the fused-head
# path prefers LARGER tiles at big hops — the in-kernel head dot's M dim is
# the tile's frame count, so tf=32 runs the MXU at 34/128 rows while tf=128
# runs it full (the mechanism behind the r4 all-blocks-fh loss).
TILE_TARGET = 8192


def _pick_tile_frames(n_frames: int, hop: int) -> int:
    # ~8k samples per tile for the big hops; for small hops the VMEM bound
    # flips to the kern operand (layers*2C*rows ~ 64 KB/frame at the
    # production width), so cap the frame count instead.  r4 slope timing
    # at hop 8: tf 144/288 both ~0.1 ms — the per-frame (2C, R) @ (R, 8)
    # micro-dots are latency-tolerable at the T/32 rate.
    target = min(max(1, TILE_TARGET // hop), 144)
    divisors = [tf for tf in range(1, n_frames + 1) if n_frames % tf == 0]
    return min(divisors, key=lambda tf: abs(tf - target))


def fusable(hop: int, n_frames: int) -> bool:
    if hop < _MIN_FUSED_HOP or n_frames < 2:
        return False
    # the shifted halo BlockSpecs need the frame axis to tile into whole
    # halo units (halo = smallest multiple of lcm(hop, 128) covering the
    # receptive field); small hops make that a real constraint (hop 8 ->
    # halo 128 -> frames % 16 == 0)
    halo = max(hop, _MIN_HALO, 128)
    while halo % 128 or halo % hop:
        halo += hop
    hf = halo // hop
    return n_frames % hf == 0 and n_frames >= hf


def _aug_call_setup(x, kern_taug, wstack_t, hop, interpret, tile_frames):
    """Tile/halo geometry + BlockSpecs shared by the aug-operand entries
    (``lvc_block_ncl_aug`` and its saved-residual training twin)."""
    b, c, length = x.shape
    _, frames, layers, c2, rows = kern_taug.shape
    assert length == frames * hop, (length, frames, hop)
    assert c2 == 2 * c, (c2, c)
    # rows is either the exact augmented count (3C+1) or a lane-tile-padded
    # variant (the head emits full 128-lane tiles so its output reshape is a
    # bitcast; zeros in the pad rows are sliced back off in-kernel)
    assert rows == aug_rows(c) or (rows % 128 == 0
                                   and rows >= aug_rows(c)), (rows, c)
    tf = tile_frames if tile_frames else _pick_tile_frames(frames, hop)
    n_tiles = frames // tf
    tile_s = tf * hop
    # halo: >= receptive field (_MIN_HALO), frame-aligned, AND a multiple of
    # 128 — Mosaic requires lane-dim block sizes divisible by 128
    halo = max(hop, _MIN_HALO, 128)
    while halo % 128 or halo % hop:
        halo += hop
    hf = halo // hop
    if tf % hf or (tf * hop) % halo:
        # tile must be a whole number of halo units for the shifted maps
        divisors = [t for t in range(hf, frames + 1, hf)
                    if frames % t == 0 and (t * hop) % halo == 0]
        tf = min(divisors, key=lambda t: abs(t - tf))
        n_tiles = frames // tf
        tile_s = tf * hop
    r = tile_s // halo
    rk = tf // hf
    n_halo_x = length // halo
    n_halo_k = frames // hf
    grid = (b, n_tiles)

    x_spec = pl.BlockSpec((1, c, tile_s), lambda bi, ti: (bi, 0, ti),
                          memory_space=pltpu.VMEM)

    def x_halo(side):
        def imap(bi, ti):
            if side == "l":
                return (bi, 0, jnp.maximum(ti * r - 1, 0))
            return (bi, 0, jnp.minimum(ti * r + r, n_halo_x - 1))
        return pl.BlockSpec((1, c, halo), imap, memory_space=pltpu.VMEM)

    k_spec = pl.BlockSpec((1, tf, layers, c2, rows),
                          lambda bi, ti: (bi, ti, 0, 0, 0),
                          memory_space=pltpu.VMEM)

    def k_halo(side):
        def imap(bi, ti):
            if side == "l":
                return (bi, jnp.maximum(ti * rk - 1, 0), 0, 0, 0)
            return (bi, jnp.minimum(ti * rk + rk, n_halo_k - 1), 0, 0, 0)
        return pl.BlockSpec((1, hf, layers, c2, rows), imap,
                            memory_space=pltpu.VMEM)

    wrows = wstack_t.shape[-1]                  # un-padded (3C+1)
    wspec = pl.BlockSpec((layers, c, wrows), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM)

    common = dict(
        grid=grid,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )
    in_specs = [x_spec, x_halo("l"), x_halo("r"),
                x_spec, x_halo("l"), x_halo("r"),
                k_spec, k_halo("l"), k_halo("r"), wspec]
    out_spec = pl.BlockSpec((1, c, tile_s), lambda bi, ti: (bi, 0, ti),
                            memory_space=pltpu.VMEM)
    body_kw = dict(hop=hop, layers=layers, c=c, length=length,
                   tile_s=tile_s, halo=halo)
    return in_specs, out_spec, common, body_kw


@functools.partial(jax.jit, static_argnames=("hop", "interpret",
                                             "tile_frames"))
def lvc_block_ncl_aug(x, skip, kern_taug, wstack_t, hop: int,
                      interpret: bool = False,
                      tile_frames: int | None = None,
                      final_wb=None):
    """Whole-LVC-block NCL megakernel.  With ``final_wb`` ((8, C): 7 final
    conv taps + a bias row) the model's k=7 C->1 output projection runs as
    an in-kernel epilogue and a second (B, 1, L) f32 output is returned."""
    b, c, length = x.shape
    in_specs, out_spec, common, body_kw = _aug_call_setup(
        x, kern_taug, wstack_t, hop, interpret, tile_frames)
    tile_s = body_kw["tile_s"]
    if final_wb is not None:
        wfin_spec = pl.BlockSpec((8, c), lambda bi, ti: (0, 0),
                                 memory_space=pltpu.VMEM)
        fin_spec = pl.BlockSpec((1, 1, tile_s), lambda bi, ti: (bi, 0, ti),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_kernel_body_final, **body_kw),
            in_specs=in_specs + [wfin_spec],
            out_specs=[out_spec, fin_spec],
            out_shape=[jax.ShapeDtypeStruct((b, c, length), x.dtype),
                       jax.ShapeDtypeStruct((b, 1, length), jnp.float32)],
            **common,
        )(x, x, x, skip, skip, skip, kern_taug, kern_taug, kern_taug,
          wstack_t, final_wb)
    return pl.pallas_call(
        functools.partial(_kernel_body, **body_kw),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, length), x.dtype),
        **common,
    )(x, x, x, skip, skip, skip, kern_taug, kern_taug, kern_taug, wstack_t)


@functools.partial(jax.jit, static_argnames=("hop", "interpret",
                                             "tile_frames"))
def lvc_block_ncl_aug_sr(x, skip, kern_taug, wstack_t, hop: int,
                         interpret: bool = False,
                         tile_frames: int | None = None):
    """``lvc_block_ncl_aug`` twin that ALSO writes the per-layer residuals
    the training backward needs: returns ``(out, s_all, y_all, z_all)`` with

        s_all (B, layers, C, L):  layer input after the skip-add (pre-leaky)
        y_all (B, layers, C, L):  post-conv post-leaky features (LVC input)
        z_all (B, layers, 2C, L): pre-gate LVC output (f32 math, stored in
                                  the activation dtype)

    so ``lvc_block_ncl_taug_sr``'s backward runs from saved intermediates
    instead of recomputing the unfused forward (the recompute is what made
    the r3/r4 ``ncl_vjp`` route LOSE to the XLA route — 53.1 vs 49.7
    ms/step, docs/PERF.md training attribution)."""
    b, c, length = x.shape
    layers = kern_taug.shape[2]
    in_specs, out_spec, common, body_kw = _aug_call_setup(
        x, kern_taug, wstack_t, hop, interpret, tile_frames)
    tile_s = body_kw["tile_s"]

    def res_spec(ch):
        return pl.BlockSpec((1, layers, ch, tile_s),
                            lambda bi, ti: (bi, 0, 0, ti),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_kernel_body_sr, **body_kw),
        in_specs=in_specs,
        out_specs=[out_spec, res_spec(c), res_spec(c), res_spec(2 * c)],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, length), x.dtype),
            jax.ShapeDtypeStruct((b, layers, c, length), x.dtype),
            jax.ShapeDtypeStruct((b, layers, c, length), x.dtype),
            jax.ShapeDtypeStruct((b, layers, 2 * c, length), x.dtype),
        ],
        **common,
    )(x, x, x, skip, skip, skip, kern_taug, kern_taug, kern_taug, wstack_t)


@functools.partial(jax.jit, static_argnames=("hop", "interpret",
                                             "tile_frames"))
def lvc_block_ncl_fh(x, skip, tap_c, w_head, b_head, wstack_t, hop: int,
                     interpret: bool = False,
                     tile_frames: int | None = None,
                     final_wb=None):
    """Fused-head NCL megakernel: the kernel-predictor HEAD matmul runs
    inside the block kernel, so the 5D ``kern_taug`` operand (the model's
    largest activation, ~59 MB/block-call at bench shapes) never exists in
    HBM — each grid cell recomputes its own kernel slab from the tiny trunk
    operand.

        x, skip:  (B, C, L)            bf16, time-minor
        tap_c:    (B, F, K)            bf16 trunk taps (K = ksz * hidden)
        w_head:   (K, layers*2C*rows_p) bf16 merged head weights, rows
                  zero-padded to the 128 lane tile (see
                  _kernel_predictor_apply_taug)
        b_head:   (1, layers*2C*rows_p) f32 merged head bias
        -> (B, C, L) [+ (B, 1, L) f32 with ``final_wb``]

    Same math as taug_head_matmul_5d -> lvc_block_ncl_aug (f32 accumulate +
    bias then bf16 cast): bit-exact parity with the two-kernel path."""
    b, c, length = x.shape
    _, frames, khead = tap_c.shape
    assert length == frames * hop, (length, frames, hop)
    rows = aug_rows(c)
    rows_p = ((rows + 127) // 128) * 128
    n_slab = 2 * c * rows_p
    layers = w_head.shape[1] // n_slab
    assert w_head.shape[1] == layers * n_slab, (w_head.shape, n_slab)
    tf = tile_frames if tile_frames else _pick_tile_frames(frames, hop)
    n_tiles = frames // tf
    tile_s = tf * hop
    halo = max(hop, _MIN_HALO, 128)
    while halo % 128 or halo % hop:
        halo += hop
    hf = halo // hop
    if tf % hf or (tf * hop) % halo:
        divisors = [t for t in range(hf, frames + 1, hf)
                    if frames % t == 0 and (t * hop) % halo == 0]
        tf = min(divisors, key=lambda t: abs(t - tf))
        n_tiles = frames // tf
        tile_s = tf * hop
    r = tile_s // halo
    n_halo_x = length // halo
    grid = (b, n_tiles)

    x_spec = pl.BlockSpec((1, c, tile_s), lambda bi, ti: (bi, 0, ti),
                          memory_space=pltpu.VMEM)

    def x_halo(side):
        def imap(bi, ti):
            if side == "l":
                return (bi, 0, jnp.maximum(ti * r - 1, 0))
            return (bi, 0, jnp.minimum(ti * r + r, n_halo_x - 1))
        return pl.BlockSpec((1, c, halo), imap, memory_space=pltpu.VMEM)

    # the full (1, hfa+F+hfa, K) tap operand rides along per batch row
    # (~350 KB at bench shapes); per-frame halo BlockSpecs would need
    # 8-divisible frame blocks (hf is 1-2 at hops 256/64) — windows are cut
    # in-kernel from 8-aligned zero-padded dynamic slices instead
    # (_compute_kern_slabs)
    hfa = -(-hf // 8) * 8
    tap_c = jnp.pad(tap_c, ((0, 0), (hfa, hfa), (0, 0)))
    t_spec = pl.BlockSpec((1, frames + 2 * hfa, khead),
                          lambda bi, ti: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    wh_spec = pl.BlockSpec((khead, layers * n_slab), lambda bi, ti: (0, 0),
                           memory_space=pltpu.VMEM)
    bh_spec = pl.BlockSpec((1, layers * n_slab), lambda bi, ti: (0, 0),
                           memory_space=pltpu.VMEM)
    wrows = wstack_t.shape[-1]
    wspec = pl.BlockSpec((layers, c, wrows), lambda bi, ti: (0, 0, 0),
                         memory_space=pltpu.VMEM)

    common = dict(
        grid=grid,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=interpret,
    )
    in_specs = [x_spec, x_halo("l"), x_halo("r"),
                x_spec, x_halo("l"), x_halo("r"),
                t_spec, wh_spec, bh_spec, wspec]
    out_spec = pl.BlockSpec((1, c, tile_s), lambda bi, ti: (bi, 0, ti),
                            memory_space=pltpu.VMEM)
    kw = dict(hop=hop, layers=layers, c=c, length=length, tile_s=tile_s,
              halo=halo, rows_p=rows_p, tf=tf, hf=hf, n_frames=frames)
    if final_wb is not None:
        wfin_spec = pl.BlockSpec((8, c), lambda bi, ti: (0, 0),
                                 memory_space=pltpu.VMEM)
        fin_spec = pl.BlockSpec((1, 1, tile_s), lambda bi, ti: (bi, 0, ti),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_kernel_body_fh_final, **kw),
            in_specs=in_specs + [wfin_spec],
            out_specs=[out_spec, fin_spec],
            out_shape=[jax.ShapeDtypeStruct((b, c, length), x.dtype),
                       jax.ShapeDtypeStruct((b, 1, length), jnp.float32)],
            **common,
        )(x, x, x, skip, skip, skip, tap_c, w_head, b_head,
          wstack_t, final_wb)
    return pl.pallas_call(
        functools.partial(_kernel_body_fh, **kw),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, c, length), x.dtype),
        **common,
    )(x, x, x, skip, skip, skip, tap_c, w_head, b_head, wstack_t)


# ---------------------------------------------------------------------------
# NWC-world adapters (the model integration path)
# ---------------------------------------------------------------------------

def kern_taug_from_aug(kern_aug: jnp.ndarray) -> jnp.ndarray:
    """(B, F, layers, 3C+1, 2C) -> (B, F, layers, 2C, 3C+1)."""
    return jnp.swapaxes(kern_aug, -1, -2)


def wstack_t_from(wstack: jnp.ndarray) -> jnp.ndarray:
    """(layers, 3C+1, C) -> (layers, C, 3C+1)."""
    return jnp.swapaxes(wstack, -1, -2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lvc_block_ncl_from_nwc(x, skip, kern_aug, wstack, hop: int,
                           interpret: bool = False):
    """Drop-in twin of ``lvc_block_fused_aug`` taking NWC (B, L, C) inputs:
    transposes at entry/exit (hardware-trace cost ~0.04 ms each at the
    bench shape, against the ~1.3 ms the kernel saves on block 2).
    Backward recomputes through the unfused XLA path (same contract as the
    round-2 kernel's VJP)."""
    xt = jnp.swapaxes(x, 1, 2)
    st = jnp.swapaxes(skip, 1, 2)
    out = lvc_block_ncl_aug(xt, st,
                            kern_taug_from_aug(kern_aug).astype(x.dtype),
                            wstack_t_from(wstack).astype(x.dtype), hop,
                            interpret=interpret)
    return jnp.swapaxes(out, 1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lvc_block_ncl_nwc_taug(x, skip, kern_taug, wstack, hop: int,
                           interpret: bool = False):
    """NWC x/skip + PRE-TRANSPOSED kernel operand (B, F, layers, 2C, 3C+1)
    as emitted directly by the predictor head
    (models/fastdiff.py:_kernel_predictor_apply_taug) — the kern_aug→
    kern_taug swapaxes relayout of the model's largest activation
    (~1.45 ms/call, xplane-traced) never exists on this path.  Backward
    recomputes through the unfused XLA path, same contract as
    ``lvc_block_ncl_from_nwc``."""
    xt = jnp.swapaxes(x, 1, 2)
    st = jnp.swapaxes(skip, 1, 2)
    out = lvc_block_ncl_aug(xt, st, kern_taug.astype(x.dtype),
                            wstack_t_from(wstack).astype(x.dtype), hop,
                            interpret=interpret)
    return jnp.swapaxes(out, 1, 2)


def _taug_fwd(x, skip, kern_taug, wstack, hop, interpret):
    out = lvc_block_ncl_nwc_taug(x, skip, kern_taug, wstack, hop, interpret)
    return out, (x, skip, kern_taug, wstack)


def _taug_bwd(hop, interpret, residuals, g):
    x, skip, kern_taug, wstack = residuals
    rows = aug_rows(x.shape[-1])
    kern_aug = jnp.swapaxes(kern_taug[..., :rows], -1, -2)
    _, vjp = jax.vjp(lambda *args: _unfused_from_aug(*args, hop),
                     x, skip, kern_aug, wstack)
    dx, dskip, dka, dws = vjp(g)
    dkt = jnp.swapaxes(dka, -1, -2)
    if kern_taug.shape[-1] != rows:
        dkt = jnp.pad(dkt, [(0, 0)] * (dkt.ndim - 1)
                      + [(0, kern_taug.shape[-1] - rows)])
    return dx, dskip, dkt, dws


lvc_block_ncl_nwc_taug.defvjp(_taug_fwd, _taug_bwd)


def _unfused_from_aug(x, skip, kern_aug, wstack, hop):
    from fastdiff_tpu.ops.lvc_block_pallas import (_unfused_reference,
                                                   split_aug_kernels)
    kernels, biases = split_aug_kernels(kern_aug)
    c = x.shape[-1]
    conv_ws = wstack[:, : 3 * c].reshape(wstack.shape[0], 3, c, c)
    conv_bs = wstack[:, 3 * c]
    return _unfused_reference(x, skip, kernels, biases.astype(jnp.float32),
                              conv_ws, conv_bs.astype(jnp.float32), hop)


def _nwc_fwd(x, skip, kern_aug, wstack, hop, interpret):
    out = lvc_block_ncl_from_nwc(x, skip, kern_aug, wstack, hop, interpret)
    return out, (x, skip, kern_aug, wstack)


def _nwc_bwd(hop, interpret, residuals, g):
    x, skip, kern_aug, wstack = residuals
    _, vjp = jax.vjp(lambda *args: _unfused_from_aug(*args, hop),
                     x, skip, kern_aug, wstack)
    return vjp(g)


lvc_block_ncl_from_nwc.defvjp(_nwc_fwd, _nwc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def lvc_block_ncl(x, skip, kernels, biases, conv_ws, conv_bs, hop: int,
                  interpret: bool = False):
    """Natural-layout entry: x, skip (B, L, C); kernels
    (B, F, layers, K, C, 2C); biases (B, F, layers, 2C); conv_ws
    (layers, K, C, C); conv_bs (layers, C).  Backward recomputes unfused."""
    b, f = kernels.shape[:2]
    layers = kernels.shape[2]
    c = x.shape[-1]
    kflat = kernels.astype(x.dtype).reshape(b, f, layers, 3 * c, 2 * c)
    kern_aug = jnp.concatenate(
        [kflat, biases.astype(x.dtype)[..., None, :]], axis=3)
    ws = jnp.stack([w.reshape(-1, w.shape[-1]) for w in conv_ws])
    wstack = jnp.concatenate(
        [ws, jnp.stack(list(conv_bs))[:, None, :]], axis=1).astype(x.dtype)
    xt = jnp.swapaxes(x, 1, 2)
    st = jnp.swapaxes(skip, 1, 2)
    out = lvc_block_ncl_aug(xt, st, kern_taug_from_aug(kern_aug),
                            wstack_t_from(wstack), hop, interpret=interpret)
    return jnp.swapaxes(out, 1, 2)


def _nat_fwd(x, skip, kernels, biases, conv_ws, conv_bs, hop, interpret):
    out = lvc_block_ncl(x, skip, kernels, biases, conv_ws, conv_bs, hop,
                        interpret)
    return out, (x, skip, kernels, biases, conv_ws, conv_bs)


def _nat_bwd(hop, interpret, residuals, g):
    from fastdiff_tpu.ops.lvc_block_pallas import _unfused_reference
    x, skip, kernels, biases, conv_ws, conv_bs = residuals
    _, vjp = jax.vjp(
        lambda *args: _unfused_reference(*args, hop), x, skip, kernels,
        biases, conv_ws, conv_bs)
    return vjp(g)


lvc_block_ncl.defvjp(_nat_fwd, _nat_bwd)


# ---------------------------------------------------------------------------
# Saved-residual training entry (the "ncl_sr" route)
# ---------------------------------------------------------------------------

def _shift_l(a, k):
    """NCL time shift with zero fill: out[..., l] = a[..., l - k] — the
    global (full-array) semantics of the kernel's masked circular rolls and
    of the reference's pad-and-slice taps."""
    if k == 0:
        return a
    nd = a.ndim
    if k > 0:
        pad = [(0, 0)] * (nd - 1) + [(k, 0)]
        return jnp.pad(a[..., : a.shape[-1] - k], pad)
    pad = [(0, 0)] * (nd - 1) + [(0, -k)]
    return jnp.pad(a[..., -k:], pad)


def _sr_backward(kern_taug, wstack_t, s_all, y_all, z_all, g, hop):
    """Manual NCL-layout backward of the 4-layer LVC block from saved
    intermediates (no forward recompute, no layout oscillation: every
    activation stays (B, C, L) time-minor, the per-frame contractions are
    the transposes of the forward's MXU dots).

    Math per layer i (forward, see _kernel_core):
        s = carry + skip;  a = leaky(s)
        y = leaky(W_i @ [shift(a,+d); a; shift(a,-d); ones])   d = 3**i
        z[f] = K_if @ [shift(y,+1); y; shift(y,-1); ones][:, f*hop:(f+1)*hop]
        carry' = s + sigmoid(z[:C]) * tanh(z[C:])
    leaky' is recovered from the saved OUTPUT's sign (leaky is monotone and
    sign-preserving), so pre-activation values need not be saved."""
    b, layers, c, length = s_all.shape
    rows = aug_rows(c)
    f = length // hop
    cdtype = s_all.dtype
    ones = jnp.ones((b, 1, length), cdtype)
    g = g.astype(jnp.float32)
    dskip = jnp.zeros_like(g)
    dk_layers, dw_layers = [], []
    for i in reversed(range(layers)):
        d = 3 ** i
        s_i = s_all[:, i]
        y_i = y_all[:, i]
        z_i = z_all[:, i].astype(jnp.float32)
        sg = jax.nn.sigmoid(z_i[:, :c])
        th = jnp.tanh(z_i[:, c:])
        dz = jnp.concatenate(
            [g * th * sg * (1.0 - sg), g * sg * (1.0 - th * th)],
            axis=1).astype(cdtype)                        # (B, 2C, L)
        # LVC backward: per-frame transposed contractions
        k_i = kern_taug[:, :, i, :, :rows]                # (B, F, 2C, R)
        dz_r = dz.reshape(b, 2 * c, f, hop)
        tap_y = jnp.concatenate(
            [_shift_l(y_i, 1), y_i, _shift_l(y_i, -1), ones], axis=1)
        tap_y_r = tap_y.reshape(b, rows, f, hop)
        dk = jnp.einsum("bcfh,brfh->bfcr", dz_r, tap_y_r,
                        preferred_element_type=jnp.float32)
        dtap = jnp.einsum("bfcr,bcfh->brfh", k_i, dz_r,
                          preferred_element_type=jnp.float32)
        dtap = dtap.reshape(b, rows, length)
        dy = (_shift_l(dtap[:, :c], -1) + dtap[:, c: 2 * c]
              + _shift_l(dtap[:, 2 * c: 3 * c], 1))
        dy_raw = (dy * jnp.where(y_i > 0, 1.0, 0.2)).astype(cdtype)
        # dilated-conv backward
        a_i = _leaky(s_i)
        tap_a = jnp.concatenate(
            [_shift_l(a_i, d), a_i, _shift_l(a_i, -d), ones], axis=1)
        dtap_a = jnp.einsum("cr,bcl->brl", wstack_t[i], dy_raw,
                            preferred_element_type=jnp.float32)
        dw = jnp.einsum("bcl,brl->cr", dy_raw, tap_a,
                        preferred_element_type=jnp.float32)
        da = (_shift_l(dtap_a[:, :c], -d) + dtap_a[:, c: 2 * c]
              + _shift_l(dtap_a[:, 2 * c: 3 * c], d))
        ds = g + da * jnp.where(s_i > 0, 1.0, 0.2)
        dskip = dskip + ds
        g = ds                                            # d carry_{i-1}
        dk_layers.append(dk)
        dw_layers.append(dw)
    dkern = jnp.stack(dk_layers[::-1], axis=2)            # (B, F, l, 2C, R)
    if kern_taug.shape[-1] != rows:
        dkern = jnp.pad(dkern, [(0, 0)] * 4
                        + [(0, kern_taug.shape[-1] - rows)])
    dwstack = jnp.stack(dw_layers[::-1], axis=0)
    return (g.astype(cdtype), dskip.astype(cdtype),
            dkern.astype(kern_taug.dtype), dwstack.astype(wstack_t.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def lvc_block_ncl_taug_sr(x, skip, kern_taug, wstack_t, hop: int,
                          interpret: bool = False):
    """Trainable NCL megakernel with a SAVED-RESIDUAL VJP: the forward is
    the fused Pallas kernel emitting per-layer intermediates
    (``lvc_block_ncl_aug_sr``), the backward is manual NCL math over the
    saved arrays (``_sr_backward``) — unlike ``lvc_block_ncl`` /
    ``lvc_block_ncl_nwc_taug`` there is NO unfused forward recompute in the
    backward.  Inputs are the NCL operands: x, skip (B, C, L); kern_taug
    (B, F, layers, 2C, 3C+1 or lane-padded); wstack_t (layers, C, 3C+1)."""
    out, _, _, _ = lvc_block_ncl_aug_sr(x, skip, kern_taug, wstack_t, hop,
                                        interpret=interpret)
    return out


def _sr_fwd(x, skip, kern_taug, wstack_t, hop, interpret):
    out, s_all, y_all, z_all = lvc_block_ncl_aug_sr(
        x, skip, kern_taug, wstack_t, hop, interpret=interpret)
    return out, (kern_taug, wstack_t, s_all, y_all, z_all)


def _sr_bwd(hop, interpret, residuals, g):
    kern_taug, wstack_t, s_all, y_all, z_all = residuals
    return _sr_backward(kern_taug, wstack_t, s_all, y_all, z_all, g, hop)


lvc_block_ncl_taug_sr.defvjp(_sr_fwd, _sr_bwd)
