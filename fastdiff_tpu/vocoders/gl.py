"""Griffin-Lim debug vocoders (reference: vocoders/gl_mel.py, gl_linear.py,
vocoders/stft.py) — phase-reconstruction baselines that need no model."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.config import AudioConfig
from fastdiff_tpu.ops import dsp
from fastdiff_tpu.vocoders.base import BaseVocoder, register_vocoder


@register_vocoder
class GLMel(BaseVocoder):
    """log-mel -> linear magnitude (filterbank pseudo-inverse) -> Griffin-Lim
    (reference: vocoders/gl_mel.py:12-22)."""

    def spec2wav(self, mel: np.ndarray, **kwargs) -> np.ndarray:
        cfg = AudioConfig.from_hparams(self.hparams)
        linear = dsp.mel_to_linear_np(np.asarray(mel).T, cfg)   # (bins, T)
        wav = dsp.griffin_lim_jax(jnp.asarray(linear)[None], cfg)
        return np.asarray(wav)[0]


@register_vocoder
class GLLinear(BaseVocoder):
    """log-linear magnitude -> Griffin-Lim (reference: vocoders/gl_linear.py)."""

    def spec2wav(self, linear: np.ndarray, **kwargs) -> np.ndarray:
        cfg = AudioConfig.from_hparams(self.hparams)
        if cfg.mel_compression == "log10":
            amp = np.power(10.0, np.asarray(linear).T)
        else:
            amp = np.exp(np.asarray(linear).T)
        wav = dsp.griffin_lim_jax(jnp.asarray(amp)[None], cfg)
        return np.asarray(wav)[0]


@register_vocoder
class STFT(BaseVocoder):
    """Raw magnitude STFT -> Griffin-Lim (reference: vocoders/stft.py:9-36)."""

    def spec2wav(self, spec: np.ndarray, **kwargs) -> np.ndarray:
        cfg = AudioConfig.from_hparams(self.hparams)
        wav = dsp.griffin_lim_jax(jnp.asarray(np.asarray(spec).T)[None], cfg)
        return np.asarray(wav)[0]
