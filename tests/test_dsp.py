"""DSP front-end parity: our native STFT/mel vs torch (and torchaudio when
available) as independent oracles, plus the reference wav-padding rule."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from fastdiff_tpu.config import AudioConfig
from fastdiff_tpu.ops import dsp


CFG = AudioConfig()


def test_stft_magnitude_matches_torch_constant_pad(rng):
    wav = rng.standard_normal(5000).astype(np.float32)
    got = dsp.stft_magnitude_np(wav, 1024, 256, 1024, "constant")
    win = torch.hann_window(1024, periodic=True)
    want = torch.stft(
        torch.from_numpy(np.pad(wav, (512, 512))), n_fft=1024, hop_length=256,
        win_length=1024, window=win, center=False, return_complex=True).abs().numpy()
    assert got.shape == want.shape == (513, 1 + len(wav) // 256)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_stft_magnitude_matches_torch_reflect_pad(rng):
    wav = rng.standard_normal(4096).astype(np.float32)
    got = dsp.stft_magnitude_np(wav, 1024, 256, 1024, "reflect")
    win = torch.hann_window(1024, periodic=True)
    want = torch.stft(torch.from_numpy(wav), n_fft=1024, hop_length=256,
                      win_length=1024, window=win, center=True,
                      pad_mode="reflect", return_complex=True).abs().numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_stft_jax_matches_numpy(rng):
    wav = rng.standard_normal((2, 3000)).astype(np.float32)
    got = np.asarray(dsp.stft_magnitude_jax(jnp.asarray(wav), 1024, 256, 1024))
    for b in range(2):
        want = dsp.stft_magnitude_np(wav[b], 1024, 256, 1024)
        np.testing.assert_allclose(got[b], want, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_matches_torchaudio():
    ta = pytest.importorskip("torchaudio")
    want = ta.functional.melscale_fbanks(
        n_freqs=513, f_min=80.0, f_max=7600.0, n_mels=80, sample_rate=22050,
        norm="slaney", mel_scale="slaney").numpy().T
    got = dsp.mel_filterbank(22050, 1024, 80, 80.0, 7600.0)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_mel_filterbank_shape_and_coverage():
    fb = dsp.mel_filterbank(22050, 1024, 80, 80.0, 7600.0)
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every mel filter has support
    assert (fb.sum(axis=1) > 0).all()


def test_wav2mel_padding_rule(rng):
    """process_utterance pads the wav so len(wav) == frames * hop
    (reference: data_gen_utils.py:138-140, utils/audio.py:67-76)."""
    wav = rng.standard_normal(10000).astype(np.float32) * 0.1
    wav_out, mel = dsp.wav2mel_np(wav, CFG)
    assert mel.shape[0] == 80
    assert mel.shape[1] == 1 + len(wav) // 256
    assert len(wav_out) == mel.shape[1] * 256


def test_wav2mel_jax_matches_np(rng):
    wav = rng.standard_normal(8192).astype(np.float32) * 0.2
    _, want = dsp.wav2mel_np(wav, CFG)
    got = np.asarray(dsp.mel_spectrogram_jax(jnp.asarray(wav[None, :]), CFG))[0]
    np.testing.assert_allclose(got[:, : want.shape[1]], want, rtol=1e-3, atol=2e-3)


def test_tacotron_frontend_ln_compression(rng):
    cfg = AudioConfig(fmin=0.0, fmax=8000.0, mel_eps=1e-5, mel_compression="ln")
    wav = (rng.standard_normal(8192) * 0.1).astype(np.float32)
    _, mel = dsp.wav2mel_np(wav, cfg)
    # ln-compressed mels are clamped at ln(1e-5)
    assert mel.min() >= np.log(1e-5) - 1e-5


def test_istft_roundtrip(rng):
    wav = rng.standard_normal((1, 4096)).astype(np.float32)
    spec = dsp.frame_signal(jnp.asarray(wav), 1024, 256, "constant")
    win = jnp.asarray(dsp.hann_window(1024, 1024))
    cplx = jnp.fft.rfft(spec * win[None, None, :], axis=-1).swapaxes(-1, -2)
    mag, phase = jnp.abs(cplx), jnp.angle(cplx)
    rec = dsp.istft_jax(mag, phase, 1024, 256, 1024, 4096)
    # interior reconstruction (edges lose window coverage)
    np.testing.assert_allclose(np.asarray(rec)[0, 512:-512], wav[0, 512:-512],
                               rtol=1e-3, atol=1e-3)


def test_griffin_lim_reduces_error(rng):
    """GL from a real magnitude spectrogram should produce a waveform whose
    own magnitude spectrogram is close to the target."""
    t = np.arange(4096) / 22050.0
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None, :]
    mag = dsp.stft_magnitude_jax(jnp.asarray(wav), 1024, 256, 1024)
    rec = dsp.griffin_lim_jax(mag, CFG, n_iters=30)
    mag_rec = dsp.stft_magnitude_jax(rec[:, :4096], 1024, 256, 1024)
    n = min(mag.shape[-1], mag_rec.shape[-1])
    err = float(jnp.linalg.norm(mag_rec[..., :n] - mag[..., :n])
                / jnp.linalg.norm(mag[..., :n]))
    assert err < 0.35, err
