"""Functional NN primitives: conv1d, transposed conv1d, dense, weight norm.

Design: parameter pytrees (plain dicts of jnp arrays) + pure apply functions.
No module framework — the FastDiff denoiser is small and bespoke, and explicit
pytrees make sharding annotation and torch-checkpoint import unambiguous.

Layout: activations are NWC ``(batch, time, channels)`` — the TPU-canonical
convolution layout. Conv weights are stored as ``(K, I, O)`` (WIO). Transposed
conv weights are stored pre-flipped as ``(K, I, O)`` so upsampling lowers to a
single ``conv_general_dilated`` with ``lhs_dilation`` (input dilation), which
XLA maps onto the MXU directly.

Torch-compatibility notes (for checkpoint import and training parity):
- torch ``Conv1d`` weights are (O, I, K) -> ours is ``transpose(2, 1, 0)``.
- torch ``ConvTranspose1d`` weights are (I, O, K); ours stores the kernel
  flipped along K and transposed to (K, I, O); the padding arithmetic
  reproduces torch's ``(L-1)*s - 2p + k + op`` output length exactly
  (reference uses k=2r, s=r, p=r//2 + r%2, op=r%2 at
  modules/FastDiff/module/modules.py:163-166, which is an exact x{r} upsample).
- weight norm follows torch's ``dim=0`` convention: for Conv1d the norm is
  per *output* channel over (I, K); for ConvTranspose1d per *input* channel
  over (O, K) (reference applies weight norm to every conv,
  modules/FastDiff/module/FastDiff_model.py:115-122).
- initializers replicate torch defaults (kaiming-uniform with a=sqrt(5), i.e.
  U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and bias) so training
  from scratch starts from the same distribution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_DIMSPEC = ("NWC", "WIO", "NWC")

# Batch-policy knobs for the NCL formulations below, read at TRACE time
# (exp harnesses flip them around separate jit closures to A/B the
# merged-batch paths in-context; production values are pinned by the
# committed A/B results — docs/PERF.md "batch scaling").
#
# r5 interleaved b=4 sampler matrix (scripts/exp_r5a.py, healthy session):
#   nomerge 23.67 | convt_only 23.98 | dotds 29.23 | conv_only 29.97 |
#   ship(merged) 30.41 | fh4 30.55 ms
# The conv1d_ncl kron(I_B, W) merge — landed in r4 with "timing pending" —
# was the b=4 regression (6.7 ms/sampler); both merges revert to the
# einsum batched dots.  The code stays behind the knobs as a measured
# negative result.
MERGE_BATCH_CONV_MAX = 0    # conv1d_ncl kron(I_B, W) path for 2 <= b <= this
MERGE_BATCH_CONVT_MAX = 0   # conv_transpose1d_ncl merged phase-dot path
DOT_DOWNSAMPLE_MAX_B = 1    # nearest_downsample_ncl selection-matmul path
# conv_transpose1d_ncl selection-matmul phase interleave for b >= this
# (r5f interleaved A/B: b=4 21.78 vs 23.76 ms — the transpose-interleave
# copies ran 6.8x their b=1 rate; b=1 6.02 vs 4.96 ms — the copy is cheap
# at b=1 and the dot's extra pass loses, 4/4 reps each way, bit-exact)
DOT_INTERLEAVE_MIN_B = 2


# ---------------------------------------------------------------------------
# Initializers (torch-default-compatible)
# ---------------------------------------------------------------------------

def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv1d_init(key, in_ch: int, out_ch: int, kernel_size: int,
                weight_norm: bool = False) -> dict:
    """Init a conv1d parameter dict: {'w' or ('g','v'), 'b'}; w is (K, I, O)."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * kernel_size
    bound = 1.0 / np.sqrt(fan_in)
    w = _uniform(kw, (kernel_size, in_ch, out_ch), bound)
    b = _uniform(kb, (out_ch,), bound)
    if weight_norm:
        # torch: g initialized to ||v|| per output channel (dim=0 of (O,I,K)).
        g = jnp.sqrt(jnp.sum(w ** 2, axis=(0, 1)))
        return {"v": w, "g": g, "b": b}
    return {"w": w, "b": b}


def conv_transpose1d_init(key, in_ch: int, out_ch: int, kernel_size: int,
                          weight_norm: bool = False) -> dict:
    """Init a transposed-conv1d dict; kernel stored flipped as (K, I, O).

    torch fan_in for ConvTranspose1d is out_ch * kernel_size (weight shape
    (I, O, K), init uses fan_in of dim-1 * K).
    """
    kw, kb = jax.random.split(key)
    fan_in = out_ch * kernel_size
    bound = 1.0 / np.sqrt(fan_in)
    w = _uniform(kw, (kernel_size, in_ch, out_ch), bound)
    b = _uniform(kb, (out_ch,), bound)
    if weight_norm:
        # torch dim=0 of (I, O, K) = per *input* channel, norm over (O, K).
        g = jnp.sqrt(jnp.sum(w ** 2, axis=(0, 2)))
        return {"v": w, "g": g, "b": b}
    return {"w": w, "b": b}


def dense_init(key, in_ch: int, out_ch: int) -> dict:
    """Init a dense layer: w (I, O), b (O); torch nn.Linear defaults."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(in_ch)
    return {"w": _uniform(kw, (in_ch, out_ch), bound),
            "b": _uniform(kb, (out_ch,), bound)}


# ---------------------------------------------------------------------------
# Weight-norm resolution
# ---------------------------------------------------------------------------

def conv_weight(params: dict) -> jnp.ndarray:
    """Materialize the effective (K, I, O) conv kernel (fusing weight norm)."""
    if "g" in params:
        v = params["v"]
        norm = jnp.sqrt(jnp.sum(v ** 2, axis=(0, 1), keepdims=True) + 1e-12)
        return params["g"][None, None, :] * v / norm
    return params["w"]


def conv_transpose_weight(params: dict) -> jnp.ndarray:
    """Effective (K, I, O) transposed-conv kernel (weight norm over (K, O))."""
    if "g" in params:
        v = params["v"]
        norm = jnp.sqrt(jnp.sum(v ** 2, axis=(0, 2), keepdims=True) + 1e-12)
        return params["g"][None, :, None] * v / norm
    return params["w"]


# ---------------------------------------------------------------------------
# Apply functions
# ---------------------------------------------------------------------------

def conv1d(params: dict, x: jnp.ndarray, *, dilation: int = 1,
           padding=None, stride: int = 1,
           compute_dtype=None, impl: str = "dot") -> jnp.ndarray:
    """1-D convolution, NWC. ``padding=None`` -> torch-style 'same' for odd k.

    ``impl='dot'`` (default) routes to the shifted-matmul formulation for
    same-padding stride-1 convs — ~2x faster than XLA's conv lowering at
    thin-channel audio shapes (see ``conv1d_dot``); other cases and
    ``impl='lax'`` use ``conv_general_dilated``.

    Under a bf16 ``compute_dtype`` the epilogue stays bf16 (accumulation is
    still f32 inside the MXU via ``preferred_element_type``): f32 outputs
    double HBM traffic on every layer boundary, which measured ~1.8x slower
    on dilated-conv chains at vocoder shapes.
    """
    if impl == "dot" and padding is None and stride == 1:
        return conv1d_dot(params, x, dilation=dilation,
                          compute_dtype=compute_dtype)
    w = conv_weight(params)
    out_dtype = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        out_dtype = compute_dtype
    k = w.shape[0]
    if padding is None:
        pad = dilation * ((k - 1) // 2)
        padding = [(pad, pad)]
    elif isinstance(padding, int):
        padding = [(padding, padding)]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=padding,
        rhs_dilation=(dilation,), dimension_numbers=_DIMSPEC,
        preferred_element_type=jnp.float32)
    return (y + params["b"][None, None, :]).astype(out_dtype)


def conv_transpose1d(params: dict, x: jnp.ndarray, *, stride: int,
                     torch_padding: int, output_padding: int = 0,
                     compute_dtype=None) -> jnp.ndarray:
    """Transposed 1-D convolution with torch output-length semantics.

    Implemented as an input-dilated convolution: insert (stride-1) zeros
    between samples, pad both edges by (k-1-torch_padding) (+output_padding
    on the right), correlate with the stored (already flipped) kernel.
    Output length = (L-1)*stride - 2*torch_padding + k + output_padding.
    """
    w = conv_transpose_weight(params)
    out_dtype = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        out_dtype = compute_dtype
    k = w.shape[0]
    lo = k - 1 - torch_padding
    hi = k - 1 - torch_padding + output_padding
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(lo, hi)],
        lhs_dilation=(stride,), dimension_numbers=_DIMSPEC,
        preferred_element_type=jnp.float32)
    return (y + params["b"][None, None, :]).astype(out_dtype)


def conv1d_dot(params: dict, x: jnp.ndarray, *, dilation: int = 1,
               compute_dtype=None) -> jnp.ndarray:
    """conv1d as K shifted matmuls: y = sum_k shift_k(x) @ w[k].

    Numerically identical to ``conv1d`` ('same' padding, odd k) but bypasses
    XLA's convolution lowering, which at these thin-channel shapes picks
    time-in-lanes layouts and inserts multi-ms relayout copies (seen in
    device traces). Plain dots keep the canonical (8, 128) layout end to end
    and the shifts are free views.
    """
    w = conv_weight(params)
    out_dtype = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        out_dtype = compute_dtype
    k = w.shape[0]
    pad = dilation * ((k - 1) // 2)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    length = x.shape[1]
    y = None
    for tap in range(k):
        xs = jax.lax.slice_in_dim(xp, tap * dilation, tap * dilation + length,
                                  axis=1)
        term = jnp.dot(xs, w[tap], preferred_element_type=jnp.float32)
        y = term if y is None else y + term
    return (y + params["b"][None, None, :]).astype(out_dtype)


def conv_transpose1d_dot(params: dict, x: jnp.ndarray, *, stride: int,
                         torch_padding: int, output_padding: int = 0,
                         compute_dtype=None) -> jnp.ndarray:
    """Transposed conv1d as phase matmuls (exact ``conv_transpose1d`` match
    for the k=2*stride upsampler family; general k supported).

    Derivation from the input-dilated form: with lo = k-1-torch_padding,
    output sample n = t*stride + p reads x[t + (p + tap - lo)//stride] for
    taps with (p + tap - lo) % stride == 0. Grouping taps by their input
    shift s gives  Y[t, p, :] = sum_s shift_s(x)[t] @ B_s[:, p, :]  — a few
    (L/r, C) @ (C, r*C) MXU matmuls instead of a zero-stuffed convolution.
    """
    w = conv_transpose_weight(params)
    out_dtype = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        out_dtype = compute_dtype
    k, c_in, c_out = w.shape
    lo = k - 1 - torch_padding
    length = x.shape[1]

    # group taps by input shift s; phase matrices built with static indexing
    groups = {}
    for tap in range(k):
        p = (lo - tap) % stride
        s = (p + tap - lo) // stride
        groups.setdefault(s, []).append((p, tap))
    zero = jnp.zeros((c_in, c_out), w.dtype)
    # how far shifts reach: pad x accordingly
    s_min = min(groups)
    s_max = max(groups)
    xp = jnp.pad(x, ((0, 0), (-s_min, s_max), (0, 0)))

    y = None
    for s, taps in sorted(groups.items()):
        per_phase = [zero] * stride
        for p, tap in taps:
            per_phase[p] = w[tap]
        b_s = jnp.stack(per_phase, axis=1).reshape(c_in, stride * c_out)
        xs = jax.lax.slice_in_dim(xp, s - s_min, s - s_min + length, axis=1)
        term = jnp.dot(xs, b_s, preferred_element_type=jnp.float32)
        y = term if y is None else y + term
    y = y.reshape(x.shape[0], length * stride, c_out)
    target = (length - 1) * stride - 2 * torch_padding + k + output_padding
    if y.shape[1] != target:
        # general-k trimming (k=2*stride family yields exactly L*stride)
        extra = y.shape[1] - target
        y = y[:, : y.shape[1] - extra, :] if extra > 0 else jnp.pad(
            y, ((0, 0), (0, -extra), (0, 0)))
    return (y + params["b"][None, None, :]).astype(out_dtype)


def dense(params: dict, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    w = params["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    return y + params["b"].astype(y.dtype)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def swish(x):
    return x * jax.nn.sigmoid(x)


def leaky_relu(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


def nearest_downsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """torch ``F.interpolate(size=T//factor)`` (nearest) == strided slice.

    For integer downsample factors, torch nearest picks index
    floor(t * in/out) = t*factor (reference: modules.py:131-133).
    """
    return x[:, ::factor, :]


# ---------------------------------------------------------------------------
# NCL (channels, time-in-lanes) apply functions — the inference-path layout
# of the round-3 NCL megakernel (ops/lvc_block_ncl.py). In this layout every
# elementwise op runs at full 128 lanes and conv taps are minor-dim shifts;
# the NWC<->NCL boundary transposes they replace cost ~1.2 ms each at full
# rate (device-traced, docs/PERF.md). Semantics match the NWC twins exactly
# (same-padding stride-1 convs / torch transposed-conv output lengths).
# ---------------------------------------------------------------------------

def conv1d_ncl(params: dict, x: jnp.ndarray, *, dilation: int = 1,
               compute_dtype=None) -> jnp.ndarray:
    """``conv1d_dot`` twin for NCL inputs: x (B, C_in, L) -> (B, C_out, L).

    K shifted (C_out, C_in) @ (C_in, L) dots with time in lanes; 'same'
    zero padding, stride 1 (the only case the model uses)."""
    w = conv_weight(params)                     # (K, I, O)
    out_dtype = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        out_dtype = compute_dtype
    k = w.shape[0]
    length = x.shape[2]
    pad = dilation * ((k - 1) // 2)
    xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
    if w.shape[2] == 1:
        # degenerate-output conv (the model's final 32->1 projection): an
        # M=1 dot makes XLA fall back to 1D T(1024) layouts and multi-output
        # tap fusions (0.55 ms/sampler in the r4 trace).  Broadcast-multiply
        # each tap and reduce over channels instead — 100% lane-efficient
        # VPU work on the (C, L) operand.
        acc = None
        for tap in range(k):
            xs = jax.lax.slice_in_dim(
                xp, tap * dilation, tap * dilation + length, axis=2)
            term = xs.astype(jnp.float32) * w[tap, :, 0].astype(
                jnp.float32)[None, :, None]
            acc = term if acc is None else acc + term
        y = jnp.sum(acc, axis=1, keepdims=True)
        return (y + params["b"][None, :, None]).astype(out_dtype)
    b, c_in, c_out = x.shape[0], w.shape[1], w.shape[2]
    if 2 <= b <= MERGE_BATCH_CONV_MAX and b * max(c_in, c_out) <= 256:
        # merged-batch block-diagonal dot: at C=32 a per-item dot uses 32 of
        # the MXU's 128 contraction rows, so a batched dot wastes 4x AND
        # XLA lowers the batch dim to convolution fusions with bad layouts
        # (b=4 trace: 1.94 ms/sampler on the block-2 upsampler dots alone).
        # kron(I_B, w) makes one full-width (B*C_out, B*C_in) @ (B*C_in, L)
        # dot — B^2/ (128/C)^2 extra FLOPs ride in lanes the MXU was
        # padding anyway, and the batch dim disappears from the graph.
        # Lane shifts act within each (b, i) row, so taps never cross items.
        # ASSUMES FINITE INPUTS: the structural zeros of kron(I_B, w)
        # contract as 0 * Inf/NaN = NaN, so one non-finite batch item would
        # poison the others (unlike the einsum path).  Inference activations
        # are finite by construction; the serving path NaN-guards upstream.
        xm = xp.reshape(b * c_in, xp.shape[2])
        eye = jnp.eye(b, dtype=w.dtype)
        y = None
        for tap in range(k):
            xs = jax.lax.slice_in_dim(
                xm, tap * dilation, tap * dilation + length, axis=1)
            wb = jnp.kron(eye, jnp.transpose(w[tap]))      # (B*O, B*I)
            term = jax.lax.dot_general(
                wb, xs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = term if y is None else y + term
        y = y.reshape(b, c_out, length)
        return (y + params["b"][None, :, None]).astype(out_dtype)
    y = None
    for tap in range(k):
        xs = jax.lax.slice_in_dim(xp, tap * dilation, tap * dilation + length,
                                  axis=2)
        term = jnp.einsum("io,bil->bol", w[tap], xs,
                          preferred_element_type=jnp.float32)
        y = term if y is None else y + term
    return (y + params["b"][None, :, None]).astype(out_dtype)


def _interleave_group(length: int, stride: int) -> int:
    """Largest divisor g of ``length`` with ``g * stride <= 512`` (one
    128-lane-aligned output tile), preferring sublane-aligned (multiple of
    8) contractions; 0 if no divisor >= 8 exists (caller falls back to the
    transpose interleave)."""
    cap = min(512 // stride, length)
    for g in range(cap - cap % 8, 7, -8):
        if length % g == 0:
            return g
    for g in range(cap, 7, -1):
        if length % g == 0:
            return g
    return 0


@functools.lru_cache(maxsize=None)
def _interleave_sel_np(stride: int, g: int) -> np.ndarray:
    """0/1 scatter operand for the selection-matmul phase interleave:
    sel[p, i, i*stride + p] = 1 so that contracting (phase, in-lane) against
    y (B, C, stride, L/g, g) emits the phase-interleaved (B, C, L/g,
    g*stride) tile directly."""
    sel = np.zeros((stride, g, g * stride), np.float32)
    p = np.arange(stride)[:, None]
    i = np.arange(g)[None, :]
    sel[np.broadcast_to(p, (stride, g)), np.broadcast_to(i, (stride, g)),
        i * stride + p] = 1.0
    return sel


def conv_transpose1d_ncl(params: dict, x: jnp.ndarray, *, stride: int,
                         torch_padding: int, output_padding: int = 0,
                         compute_dtype=None) -> jnp.ndarray:
    """``conv_transpose1d_dot`` twin for NCL inputs:
    x (B, C_in, L) -> (B, C_out, L*stride) (k = 2*stride upsampler family).

    Phase matmuls emit (B, stride, C_out, L); the phase interleave is one
    transpose+reshape of the output (minor dims (L, stride)) instead of the
    full-rate NWC<->NCL boundary transposes — or, under ``DOT_INTERLEAVE``,
    one bit-exact 0/1 selection matmul per lane tile (the reverse of the
    ``nearest_downsample_ncl`` trick): the r5 b=4 trace showed the
    transpose interleave lowering to copies costing 3.04 ms/sampler (6.8x
    the b=1 rate), while an MXU dot with canonical layouts rides lanes the
    copy engine can't."""
    w = conv_transpose_weight(params)           # (K, I, O)
    out_dtype = jnp.float32
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        out_dtype = compute_dtype
    k, c_in, c_out = w.shape
    lo = k - 1 - torch_padding
    length = x.shape[2]

    groups = {}
    for tap in range(k):
        p = (lo - tap) % stride
        s = (p + tap - lo) // stride
        groups.setdefault(s, []).append((p, tap))
    zero = jnp.zeros((c_in, c_out), w.dtype)
    s_min = min(groups)
    s_max = max(groups)
    xp = jnp.pad(x, ((0, 0), (0, 0), (-s_min, s_max)))

    b = x.shape[0]
    merge_b = (2 <= b <= MERGE_BATCH_CONVT_MAX
               and b * max(c_in, stride * c_out) <= 1024)
    if merge_b:
        # merged-batch block-diagonal dot — same trick, rationale, and
        # finite-input assumption as conv1d_ncl: the batched phase dots
        # lowered to convolution fusions costing ~4.5x their b=1 rate at
        # b=4 (r4 trace, convolution_add_fusion.151/152)
        xm = xp.reshape(b * c_in, xp.shape[2])
        eye = jnp.eye(b, dtype=w.dtype)
    g = _interleave_group(length, stride) if (
        b >= DOT_INTERLEAVE_MIN_B and not merge_b and stride > 1) else 0
    y = None
    for s, taps in sorted(groups.items()):
        per_phase = [zero] * stride
        for p, tap in taps:
            per_phase[p] = w[tap]
        if g:
            # rows ordered (c_out, phase) so the selection-dot path below
            # reshapes to (B, C_out, stride, L) with no transpose
            b_s = jnp.transpose(jnp.stack(per_phase, axis=0),
                                (2, 0, 1)).reshape(c_out * stride, c_in)
        else:
            # rows ordered (phase, c_out)
            b_s = jnp.transpose(jnp.stack(per_phase, axis=0),
                                (0, 2, 1)).reshape(stride * c_out, c_in)
        if merge_b:
            xs = jax.lax.slice_in_dim(xm, s - s_min, s - s_min + length,
                                      axis=1)
            term = jax.lax.dot_general(
                jnp.kron(eye, b_s), xs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)    # (B*r, L)
        else:
            xs = jax.lax.slice_in_dim(xp, s - s_min, s - s_min + length,
                                      axis=2)
            term = jnp.einsum("ri,bil->brl", b_s, xs,
                              preferred_element_type=jnp.float32)
        y = term if y is None else y + term
    if g:
        # selection-matmul interleave: one dot_general contracting (phase,
        # in-lane) against the cached 0/1 scatter operand.  Bit-exact —
        # exactly one nonzero per output lane, 1.0 * x plus structural
        # zeros (0 * finite = 0); bias + cast first so the dot runs at the
        # compute dtype.
        y = y.reshape(b, c_out, stride, length)
        y = (y + params["b"][None, :, None, None]).astype(out_dtype)
        sel = jnp.asarray(_interleave_sel_np(stride, g), y.dtype)
        z = y.reshape(b, c_out, stride, length // g, g)
        y = jax.lax.dot_general(z, sel, (((2, 4), (0, 1)), ((), ())),
                                preferred_element_type=y.dtype)
        y = y.reshape(b, c_out, length * stride)
    else:
        y = y.reshape(b, stride, c_out, length)
        # bias + output-dtype cast BEFORE the phase interleave: the
        # interleave is a physical (XLU) relayout of the full-rate
        # activation, so running it at the compute dtype halves its HBM
        # traffic (r4 trace: 0.64 -> 0.32 ms per sampler on the block-2
        # upsampler)
        y = (y + params["b"][None, None, :, None]).astype(out_dtype)
        y = jnp.transpose(y, (0, 2, 3, 1)).reshape(b, c_out, length * stride)
    target = (length - 1) * stride - 2 * torch_padding + k + output_padding
    if y.shape[2] != target:
        extra = y.shape[2] - target
        y = y[:, :, : y.shape[2] - extra] if extra > 0 else jnp.pad(
            y, ((0, 0), (0, 0), (0, -extra)))
    return y


def nearest_downsample_ncl(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """``nearest_downsample`` twin for NCL inputs (B, C, L).

    Two bit-exact formulations, picked by (static) batch size from
    in-context full-sampler A/Bs (scripts/exp_r4c.py, interleaved reps):

    - b == 1: selection-MATMUL — group lanes into 512-wide tiles and
      contract with a 0/1 selection matrix (one MXU dot, canonical
      layouts).  The merged-2D strided slice at (32, L) rows lowered to a
      gather + convert copy costing ~0.58 ms/sampler (r4 trace); the dot
      variant measured 0.6-0.8 ms/sampler faster, 4/4 interleaved reps.
    - b > 1: merged-2D lane-strided SLICE.  At b=4 the dot variant loses
      its edge (3/4 reps slower); and the earlier 3D strided slice was
      catastrophic — XLA lowered it to a batch-minor [L/4, B, C] gather
      costing 17.7 ms/sampler (46x its b=1 cost).  The (B, C) dims are
      merged before slicing so the layout stays sane.

    (A strided-identity-conv variant also measured faster in isolation,
    0.116 vs 0.136 ms, but 0.27 ms/forward SLOWER in context — XLA's conv
    emitter wins the isolated layout game but loses the fusion game.)

    ASSUMES FINITE INPUTS on the dot path (same caveat as the conv1d_ncl
    merged-batch path): a NaN/Inf at a DROPPED position contracts as
    0 * NaN = NaN into the kept output lane.  Inference activations are
    finite by construction; the training path never routes here."""
    b, c, length = x.shape
    groups = 512
    if (b <= DOT_DOWNSAMPLE_MAX_B and length % groups == 0
            and groups % factor == 0):
        sel = jnp.asarray(
            np.equal.outer(np.arange(groups),
                           np.arange(0, groups, factor)).astype(np.float32),
            x.dtype)
        xg = x.reshape(b * c, length // groups, groups)
        y = jax.lax.dot_general(xg, sel, (((2,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return y.astype(x.dtype).reshape(b, c, length // factor)
    return x.reshape(b * c, length)[:, ::factor].reshape(b, c, length // factor)
