"""Vocoder registry + Griffin-Lim vocoders."""

import numpy as np

from fastdiff_tpu.config import AudioConfig
from fastdiff_tpu.ops import dsp
from fastdiff_tpu.vocoders import get_vocoder_cls
from fastdiff_tpu.vocoders.gl import GLMel


def test_registry_lookup():
    assert get_vocoder_cls({"vocoder": "glmel"}) is GLMel
    assert get_vocoder_cls({"vocoder": "GLMel"}) is GLMel
    cls = get_vocoder_cls({"vocoder": "fastdiff_tpu.vocoders.gl.GLLinear"})
    assert cls.__name__ == "GLLinear"


def test_glmel_roundtrip_tone():
    """A pure tone should survive mel -> GL -> mel with its dominant
    frequency intact."""
    cfg = AudioConfig(griffin_lim_iters=20)
    sr = cfg.sample_rate
    t = np.arange(sr // 2) / sr
    wav = (0.6 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    _, mel = dsp.wav2mel_np(wav, cfg)

    hp = {"audio_sample_rate": sr, "audio_num_mel_bins": 80,
          "fft_size": 1024, "hop_size": 256, "win_size": 1024,
          "fmin": 80, "fmax": 7600, "griffin_lim_iters": 20}
    voc = GLMel(hp)
    rec = voc.spec2wav(mel.T)
    assert np.isfinite(rec).all()
    # dominant frequency of reconstruction ~440 Hz
    spec = np.abs(np.fft.rfft(rec))
    freq = np.fft.rfftfreq(len(rec), 1 / sr)
    peak = freq[np.argmax(spec)]
    assert abs(peak - 440.0) < 25.0, peak
