"""Mel-spectrogram reconstruction losses for acoustic-model training.

Covers the reference's ``mel_loss`` option surface (reference:
tasks/tts/tts_base.py:57-67 parses ``"l1:0.5|ssim:0.5|gdl:0.1"`` into
loss->lambda; :182-223 applies l1/mse/ssim/gdl weighted by
``weights_nonzero_speech`` — rows whose target mel is all-zero, i.e.
padding, contribute nothing). The reference's own ssim import is commented
out and its gdl_loss.py is an EMPTY file (vestigial declarations); both are
implemented here from their published formulas:

- SSIM: Wang et al. 2004, 11x11 Gaussian window (sigma 1.5), C1=(0.01)^2,
  C2=(0.03)^2, computed on bias-shifted mels (target + 6, the NATSpeech
  convention for log10 mels spanning ~[-6, 2]).
- GDL (gradient difference loss): Mathieu et al. 2016 — L1 between the
  absolute finite differences of prediction and target along both the time
  and frequency axes.

All functions take NWC mels ``(B, T, n_mels)`` and return scalars.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def parse_mel_losses(spec: str) -> dict:
    """``"l1:0.5|ssim:0.5"`` -> {"l1": 0.5, "ssim": 0.5} (tts_base.py:57-67)."""
    out = {}
    for part in str(spec).split("|"):
        part = part.strip()
        if not part:
            continue
        if ":" in part:
            name, lbd = part.split(":")
            out[name] = float(lbd)
        else:
            out[part] = 1.0
    return out


def weights_nonzero_speech(target: jnp.ndarray) -> jnp.ndarray:
    """(B, T, M) -> (B, T, 1) mask of frames with any nonzero mel energy
    (tts_base.py weights_nonzero_speech)."""
    return (jnp.abs(target).sum(-1, keepdims=True) > 0).astype(jnp.float32)


def l1_mel_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    w = weights_nonzero_speech(target)
    return (jnp.abs(pred - target) * w).sum() / jnp.maximum(
        w.sum() * target.shape[-1], 1.0)


def mse_mel_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    w = weights_nonzero_speech(target)
    return (((pred - target) ** 2) * w).sum() / jnp.maximum(
        w.sum() * target.shape[-1], 1.0)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur2d(img: jnp.ndarray, win: np.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur of (B, T, M) with 'same' zero padding."""
    w = jnp.asarray(win)
    k = w.shape[0]
    pad = k // 2
    # time axis
    xt = jnp.pad(img, ((0, 0), (pad, pad), (0, 0)))
    out = sum(xt[:, i: i + img.shape[1], :] * w[i] for i in range(k))
    # mel axis
    xm = jnp.pad(out, ((0, 0), (0, 0), (pad, pad)))
    return sum(xm[:, :, i: i + img.shape[2]] * w[i] for i in range(k))


def ssim(pred: jnp.ndarray, target: jnp.ndarray,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2) -> jnp.ndarray:
    """Per-pixel SSIM map of two (B, T, M) images (Wang et al. 2004)."""
    win = _gaussian_window()
    mu_p = _blur2d(pred, win)
    mu_t = _blur2d(target, win)
    mu_pt = mu_p * mu_t
    var_p = _blur2d(pred * pred, win) - mu_p ** 2
    var_t = _blur2d(target * target, win) - mu_t ** 2
    cov = _blur2d(pred * target, win) - mu_pt
    num = (2.0 * mu_pt + c1) * (2.0 * cov + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2)
    return num / den


def ssim_mel_loss(pred: jnp.ndarray, target: jnp.ndarray,
                  bias: float = 6.0) -> jnp.ndarray:
    """1 - SSIM on bias-shifted mels, masked to speech frames
    (tts_base.py:213-222 semantics: weights over nonzero target rows)."""
    w = weights_nonzero_speech(target)
    s = ssim(pred + bias, target + bias)
    return ((1.0 - s) * w).sum() / jnp.maximum(w.sum() * target.shape[-1], 1.0)


def gdl_mel_loss(pred: jnp.ndarray, target: jnp.ndarray,
                 alpha: float = 1.0) -> jnp.ndarray:
    """Gradient difference loss (Mathieu et al. 2016) over time + mel axes,
    masked to speech frames (the reference's empty gdl_loss.py slot in
    tts_base.py:189-193)."""
    w = weights_nonzero_speech(target)
    dt_p = jnp.abs(pred[:, 1:] - pred[:, :-1])
    dt_t = jnp.abs(target[:, 1:] - target[:, :-1])
    wt = w[:, 1:] * w[:, :-1]
    lt = (jnp.abs(dt_p - dt_t) ** alpha * wt).sum() / jnp.maximum(
        wt.sum() * target.shape[-1], 1.0)
    df_p = jnp.abs(pred[:, :, 1:] - pred[:, :, :-1])
    df_t = jnp.abs(target[:, :, 1:] - target[:, :, :-1])
    lf = (jnp.abs(df_p - df_t) ** alpha * w).sum() / jnp.maximum(
        w.sum() * (target.shape[-1] - 1), 1.0)
    return lt + lf


MEL_LOSS_FNS = {
    "l1": l1_mel_loss,
    "mse": mse_mel_loss,
    "ssim": ssim_mel_loss,
    "gdl": gdl_mel_loss,
}


def mel_loss(pred: jnp.ndarray, target: jnp.ndarray,
             loss_and_lambda: dict) -> dict:
    """Apply every configured mel loss: {"l1": l1*lbd, ...}
    (tts_base.py add_mel_loss)."""
    return {name: MEL_LOSS_FNS[name](pred, target) * lbd
            for name, lbd in loss_and_lambda.items()}
