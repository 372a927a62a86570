"""Continuous wavelet transform of f0 contours (the ``with_f0cwt`` path).

The reference declares a ``with_f0cwt`` binarization flag whose
implementation lives in its NATSpeech ancestry (base_binarizer.py
``with_f0cwt``; the standard recipe is Suni et al., "Wavelets for
intonation modeling in HMM speech synthesis"): decompose the normalized
log-f0 contour into 10 octave-spaced Mexican-hat components so a TTS model
can predict prosody at multiple temporal resolutions, then recombine.

Pipeline:
- voiced gaps are linearly interpolated, contour -> log domain,
- per-utterance mean/std normalization (stats stored for reconstruction),
- CWT with the Ricker (Mexican hat) wavelet at scales 2^(i+1) * dt0,
  i = 0..9 (dt0 = 5 ms at the standard hop),
- inverse approximation: sum_i cwt[i] * (i + 2.5)^(-5/2) / C.

Reconstruction is approximate (the discrete inverse of a redundant
transform); tests pin correlation > 0.9 against the input contour.
"""

from __future__ import annotations

import numpy as np

N_SCALES = 10


def _ricker(points: int, a: float) -> np.ndarray:
    """Mexican-hat wavelet (scipy.signal.ricker formula)."""
    x = np.arange(points) - (points - 1) / 2.0
    amp = 2.0 / (np.sqrt(3.0 * a) * np.pi ** 0.25)
    return amp * (1.0 - (x / a) ** 2) * np.exp(-0.5 * (x / a) ** 2)


def _cwt(sig: np.ndarray, widths: np.ndarray) -> np.ndarray:
    out = np.zeros((len(widths), len(sig)))
    for i, w in enumerate(widths):
        n = min(10 * int(w), len(sig))
        wavelet = _ricker(max(n, 3), w)
        out[i] = np.convolve(sig, wavelet, mode="same")
    return out


def interp_f0(f0: np.ndarray) -> np.ndarray:
    """Fill unvoiced (0) regions by linear interpolation; all-unvoiced
    contours return a constant 100 Hz."""
    f0 = np.asarray(f0, np.float64)
    voiced = f0 > 0
    if not voiced.any():
        return np.full_like(f0, 100.0)
    idx = np.arange(len(f0))
    out = f0.copy()
    out[~voiced] = np.interp(idx[~voiced], idx[voiced], f0[voiced])
    return out


def cwt_scales(dt: float = 0.005) -> np.ndarray:
    """Octave-spaced widths in frames (dt = hop seconds)."""
    return np.asarray([2.0 ** (i + 1) for i in range(N_SCALES)])


def f0_to_cwt(f0: np.ndarray):
    """f0 (T,) Hz -> (cwt_spec (T, 10), logf0_mean, logf0_std).

    The stored spectrogram is scale-normalized (each component divided by
    (i + 2.5)^(-5/2) weights at reconstruction, not storage)."""
    cont = interp_f0(f0)
    logf0 = np.log(np.maximum(cont, 1e-2))
    mean, std = float(logf0.mean()), float(logf0.std() + 1e-8)
    norm = (logf0 - mean) / std
    spec = _cwt(norm, cwt_scales()).T.astype(np.float32)     # (T, 10)
    return spec, mean, std


def cwt_to_f0_jnp(cwt_spec, mean, std):
    """In-graph (jnp) inverse for model-side cwt-pitch prediction:
    cwt_spec (B, T, 10), mean/std (B,) or (B, 1) -> f0 (B, T) Hz.

    Same approximate inverse as ``cwt_to_f0``; the per-utterance
    renormalization runs over the time axis."""
    import jax.numpy as jnp
    spec = jnp.asarray(cwt_spec, jnp.float32)
    weights = jnp.asarray([(i + 1 + 2.5) ** (-2.5)
                           for i in range(spec.shape[-1])], jnp.float32)
    recon = spec @ weights                                     # (B, T)
    recon = recon / (jnp.std(recon, axis=-1, keepdims=True) + 1e-8)
    logf0 = recon * jnp.reshape(std, (-1, 1)) + jnp.reshape(mean, (-1, 1))
    return jnp.exp(logf0)


def cwt_to_f0(cwt_spec: np.ndarray, mean: float, std: float) -> np.ndarray:
    """Approximate inverse: (T, 10) + stats -> f0 (T,) Hz."""
    spec = np.asarray(cwt_spec, np.float64)
    weights = np.asarray([(i + 1 + 2.5) ** (-2.5) for i in range(spec.shape[1])])
    recon = spec @ weights
    # empirical gain calibration: match the unit-variance normalization
    recon = recon / (np.std(recon) + 1e-8)
    logf0 = recon * std + mean
    return np.exp(logf0).astype(np.float32)
