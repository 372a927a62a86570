"""BS.1770 loudness metering/normalization + VAD silence clipping."""

import numpy as np
import pytest

from fastdiff_tpu.ops.loudness import (integrated_loudness,
                                       normalize_loudness,
                                       trim_long_silences)


@pytest.mark.parametrize("sr", [22050, 44100, 48000])
def test_full_scale_sine_calibration(sr):
    """BS.1770 calibration: a 0 dBFS 997 Hz sine reads ~-3.01 LUFS (the
    -0.691 offset cancels the K-weighting gain at 1 kHz)."""
    t = np.arange(int(sr * 2.0)) / sr
    wav = np.sin(2 * np.pi * 997.0 * t)
    lufs = integrated_loudness(wav, sr)
    assert abs(lufs - (-3.01)) < 0.15, lufs


def test_gain_linearity():
    sr = 22050
    t = np.arange(int(sr * 1.5)) / sr
    wav = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    l1 = integrated_loudness(wav, sr)
    l2 = integrated_loudness(wav * 10 ** (-6.0 / 20.0), sr)
    assert abs((l1 - l2) - 6.0) < 0.2


def test_normalize_hits_target():
    sr = 22050
    rng = np.random.default_rng(0)
    wav = 0.2 * rng.standard_normal(sr * 2).astype(np.float32)
    out = normalize_loudness(wav, sr, target_lufs=-22.0)
    assert abs(integrated_loudness(out, sr) - (-22.0)) < 0.2


def test_normalize_peak_guard_and_silence():
    sr = 22050
    quiet = 1e-4 * np.sin(2 * np.pi * 200.0 * np.arange(sr) / sr)
    out = normalize_loudness(quiet.astype(np.float32), sr, -3.0)
    assert np.abs(out).max() <= 1.0
    silence = np.zeros(sr, np.float32)
    assert integrated_loudness(silence, sr) == float("-inf")
    np.testing.assert_array_equal(normalize_loudness(silence, sr), silence)


def test_trim_long_silences_clips_only_silence():
    sr = 16000
    rng = np.random.default_rng(1)
    tone = 0.5 * np.sin(2 * np.pi * 300 * np.arange(sr) / sr).astype(np.float32)
    gap = np.zeros(2 * sr, np.float32)            # 2 s silence
    wav = np.concatenate([tone, gap, tone])
    out = trim_long_silences(wav, sr)
    # long silence shrinks substantially; voiced content survives
    assert len(out) < len(wav) - sr
    assert len(out) > 2 * len(tone) * 0.9
    # fully-voiced audio is untouched
    np.testing.assert_array_equal(trim_long_silences(tone, sr), tone)
