"""Batched mesh-sharded vocoding: bucketing, dp sharding, length trimming."""

import numpy as np

import jax
import jax.numpy as jnp

from fastdiff_tpu.config import DiffusionConfig
from fastdiff_tpu.diffusion import schedules
from fastdiff_tpu.serving.batch_vocoder import BatchedVocoder
from fastdiff_tpu.vocoders.denoise import denoise as spectral_denoise


def _constants(n=4):
    hp = schedules.compute_hyperparams_given_schedule(
        schedules.linear_beta_schedule(DiffusionConfig(T=50, beta_0=1e-4,
                                                       beta_T=0.05)))
    return schedules.sampler_constants_for_schedule(
        np.linspace(1e-4, 0.05, n), hp)


def test_batched_vocoder_shapes_and_sharding():
    hop = 4

    def fake_denoise(x, mel, t):
        # mel-conditioned toy denoiser: broadcast mel mean per frame
        cond = jnp.repeat(mel.mean(-1, keepdims=True), hop, axis=1)
        return 0.1 * x + 0.01 * cond

    voc = BatchedVocoder(fake_denoise, _constants(), hop_size=hop,
                         frame_bucket=8, max_batch=16)
    assert voc.mesh.devices.size == 8

    rng = np.random.default_rng(0)
    mels = [rng.standard_normal((f, 6)).astype(np.float32)
            for f in (5, 8, 13, 16, 7, 21, 3, 9, 10)]
    wavs = voc.vocode(mels)
    assert len(wavs) == len(mels)
    for mel, wav in zip(mels, wavs):
        assert wav.shape == (mel.shape[0] * hop,)
        assert np.isfinite(wav).all()


def test_spectral_denoise_runs():
    rng = np.random.default_rng(0)
    t = np.arange(11025) / 22050
    wav = (0.5 * np.sin(2 * np.pi * 220 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    out = spectral_denoise(wav, c=0.2)
    assert out.shape == wav.shape
    assert np.isfinite(out).all()
