"""PESQ metamorphic/property tests (no third-party PESQ exists in this
image — see the honesty note in fastdiff_tpu/utils/pesq.py; these tests pin
the behaviors the metric must have to be usable for vocoder parity)."""

import numpy as np
import pytest

from fastdiff_tpu.utils.pesq import pesq

SR = 16000


def _speechlike(seconds=3.0, seed=0):
    """Synthetic speech-like signal: AM-modulated harmonic series + noise
    floor (keeps the test independent of wav assets)."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    f0 = 120 + 30 * np.sin(2 * np.pi * 2.1 * t)
    phase = 2 * np.pi * np.cumsum(f0) / SR
    wav = sum(np.sin(k * phase) / k for k in range(1, 12))
    env = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t + rng.uniform(0, 6)))
    wav = wav * env + 0.001 * rng.normal(size=len(t))
    return (wav / np.abs(wav).max()).astype(np.float64)


@pytest.fixture(scope="module")
def clean():
    return _speechlike()


def _with_snr(wav, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    noise = rng.normal(size=wav.shape)
    noise *= np.sqrt((wav ** 2).mean() / (noise ** 2).mean())
    return wav + noise * 10 ** (-snr_db / 20)


def test_identity_is_ceiling(clean):
    assert pesq(clean, clean, SR) > 4.5
    assert pesq(clean, clean, SR, mode="nb") > 4.4


def test_monotone_in_snr(clean):
    scores = [pesq(clean, _with_snr(clean, snr), SR)
              for snr in (40, 30, 20, 10, 0)]
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 4.0          # barely audible noise
    assert scores[-1] < 2.0         # 0 dB SNR is bad


def test_range_is_lqo_scale(clean):
    bad = np.random.default_rng(2).normal(size=clean.shape)
    s = pesq(clean, bad, SR)
    assert 0.9 < s < 2.0            # unrelated noise bottoms out
    assert pesq(clean, clean, SR) <= 4.65


def test_delay_invariance(clean):
    delayed = np.concatenate([np.zeros(SR // 20), clean])  # +50 ms
    assert abs(pesq(clean, delayed, SR) - pesq(clean, clean, SR)) < 0.15


def test_gain_invariance(clean):
    assert abs(pesq(clean, 0.25 * clean, SR) - pesq(clean, clean, SR)) < 0.1


def test_resampling_path(clean):
    """22.05 kHz inputs (the vocoder's rate) go through resample_poly."""
    from scipy.signal import resample_poly
    wav22 = resample_poly(clean, 22050, SR)
    assert pesq(wav22, wav22, 22050) > 4.4


def test_distortion_ranks_below_noise_floor_above_junk(clean):
    mild = _with_snr(clean, 25)
    junk = np.random.default_rng(3).normal(size=clean.shape)
    s_clean = pesq(clean, clean, SR)
    s_mild = pesq(clean, mild, SR)
    s_junk = pesq(clean, junk, SR)
    assert s_clean > s_mild > s_junk
