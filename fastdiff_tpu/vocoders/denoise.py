"""Spectral-subtraction denoising for vocoder outputs.

(reference: vocoders/vocoder_utils.py:7-16 ``denoise`` — subtract a noise
profile estimated from the first frames, gated by ``vocoder_denoise_c``.)
"""

from __future__ import annotations

import numpy as np

from fastdiff_tpu.config import AudioConfig
from fastdiff_tpu.ops import dsp


def denoise(wav: np.ndarray, cfg: AudioConfig = None, c: float = 0.1,
            noise_frames: int = 5) -> np.ndarray:
    """Subtract ``c`` times the leading-frame noise magnitude profile."""
    cfg = cfg or AudioConfig()
    wav = np.asarray(wav, np.float32)
    spec = dsp.stft_magnitude_np(wav, cfg.fft_size, cfg.hop_size, cfg.win_size)
    # phase from the same frames
    pad = cfg.fft_size // 2
    padded = np.pad(wav, (pad, pad))
    n_frames = spec.shape[1]
    idx = (np.arange(n_frames)[:, None] * cfg.hop_size
           + np.arange(cfg.fft_size)[None, :])
    window = dsp.hann_window(cfg.win_size, cfg.fft_size)
    cplx = np.fft.rfft(padded[idx] * window[None, :], axis=-1).T
    phase = np.angle(cplx)

    profile = spec[:, :noise_frames].mean(axis=1, keepdims=True)
    cleaned = np.maximum(spec - c * profile, 0.0)

    import jax.numpy as jnp
    rec = dsp.istft_jax(jnp.asarray(cleaned)[None], jnp.asarray(phase)[None],
                        cfg.fft_size, cfg.hop_size, cfg.win_size, len(wav))
    return np.asarray(rec)[0]
