"""Location-Variable Convolution (LVC) — the FastDiff signature op.

Semantics (reference: modules/FastDiff/module/modules.py:220-253, called with
``dilation=1`` always — modules.py:216): the waveform is split into frames of
``hop`` samples; each frame gets its *own* conv kernel predicted from the
conditioning mel frame:

    out[b, l*hop + t, o] = bias[b, l, o]
        + sum_{k, i} x_pad[b, l*hop + t + k, i] * kernel[b, l, k, i, o]

with ``x_pad`` zero-padded by (K-1)//2 on both sides, t in [0, hop).

TPU-native formulation: instead of the reference's double-``unfold`` +
6-operand einsum, the op is expressed as ONE batched matmul per (batch,
frame): a (hop, K*Cin) window matrix times a (K*Cin, Cout) per-frame kernel.
XLA lowers this einsum to a batched ``dot_general`` on the MXU; the window
construction is K static shifted slices (no gathers). A whole-block fused Pallas
kernel (`fastdiff_tpu/ops/lvc_block_pallas.py`) additionally folds bias +
gated tanh/sigmoid activation + residual into the matmul epilogue (kept
flag-gated OFF: the XLA path measures faster at C=32 — docs/PERF.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lvc_windows(x: jnp.ndarray, kernel_size: int, hop: int) -> jnp.ndarray:
    """Build the framed window tensor: (B, L, C) -> (B, frames, hop, K*C).

    Equivalent to pad + double-unfold in the reference (modules.py:239-248)
    but expressed as K static shifted slices, which XLA fuses into the
    consuming matmul without materializing gathers.

    The flattened last axis is ordered (K, C): index k*C + i corresponds to
    tap k and input channel i. Kernel tensors must use the same (K, C)
    ordering of their contraction axis.
    """
    b, length, ch = x.shape
    pad = (kernel_size - 1) // 2
    x_pad = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    # taps[k][b, s, i] = x_pad[b, s + k, i],  s = l*hop + t
    taps = [x_pad[:, k: k + length, :] for k in range(kernel_size)]
    win = jnp.stack(taps, axis=2)                      # (B, L, K, C)
    frames = length // hop
    return win.reshape(b, frames, hop, kernel_size * ch)


def location_variable_convolution(x: jnp.ndarray, kernel: jnp.ndarray,
                                  bias: jnp.ndarray, hop: int) -> jnp.ndarray:
    """LVC forward: x (B, L, Cin), kernel (B, frames, K, Cin, Cout),
    bias (B, frames, Cout) -> (B, L, Cout). Requires L == frames*hop.

    The batched-matmul lowering is right at EVERY hop: slope-timed at the
    bench shape, the hop-8 einsum runs 0.007 ms/block-layer (a dense VPU
    broadcast-multiply-reduce variant measured 18x slower — XLA's batched
    dot lowering is not latency-bound even at M=8 rows per frame).
    """
    b, length, cin = x.shape
    _, frames, k, _, cout = kernel.shape
    assert length == frames * hop, (length, frames, hop)
    win = lvc_windows(x, k, hop)                       # (B, F, hop, K*Cin)
    kflat = kernel.reshape(b, frames, k * cin, cout)   # (B, F, K*Cin, Cout)
    out = jnp.einsum("bfhk,bfko->bfho", win, kflat,
                     preferred_element_type=jnp.float32)
    out = out + bias[:, :, None, :]
    return out.reshape(b, frames * hop, cout)


def lvc_gated_residual(x: jnp.ndarray, y_in: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray, hop: int) -> jnp.ndarray:
    """LVC + gated-activation + residual in one call (modules.py:216-217):

        y = LVC(y_in)                                  # y_in: conv'd features
        x_out = x + sigmoid(y[..., :C]) * tanh(y[..., C:])

    where C = x channels and the LVC outputs 2C channels.
    """
    c = x.shape[-1]
    y = location_variable_convolution(y_in, kernel, bias, hop)
    gate = jax.nn.sigmoid(y[..., :c]) * jnp.tanh(y[..., c:])
    return x + gate.astype(x.dtype)
