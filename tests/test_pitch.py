"""YIN pitch extraction: tones recover their frequency; noise is unvoiced."""

import numpy as np

from fastdiff_tpu.config import AudioConfig
from fastdiff_tpu.ops.pitch import f0_to_coarse, get_pitch, yin_f0


def _tone(freq, seconds=0.5, sr=22050):
    t = np.arange(int(sr * seconds)) / sr
    return (0.6 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_yin_recovers_tone_frequency():
    for freq in (110.0, 220.0, 330.0):
        f0 = yin_f0(_tone(freq), 22050, 256)
        voiced = f0[f0 > 0]
        assert len(voiced) > len(f0) * 0.7
        assert abs(np.median(voiced) - freq) < freq * 0.03, (freq, np.median(voiced))


def test_yin_noise_mostly_unvoiced():
    rng = np.random.default_rng(0)
    noise = (0.1 * rng.standard_normal(11025)).astype(np.float32)
    f0 = yin_f0(noise, 22050, 256)
    assert (f0 > 0).mean() < 0.4


def test_f0_to_coarse_range():
    f0 = np.asarray([0.0, 50.0, 220.0, 1100.0])
    coarse = f0_to_coarse(f0)
    assert coarse[0] == 1
    assert 1 <= coarse.min() and coarse.max() <= 255
    assert coarse[2] > coarse[1]


def test_get_pitch_alignment():
    cfg = AudioConfig()
    wav = _tone(220, seconds=1.0)
    mel_frames = 1 + len(wav) // cfg.hop_size
    f0, coarse = get_pitch(wav, mel_frames, cfg)
    assert len(f0) == mel_frames and len(coarse) == mel_frames
