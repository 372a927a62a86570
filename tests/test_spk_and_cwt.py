"""Speaker-embedding extractor + CWT f0 decomposition."""

import numpy as np

from fastdiff_tpu.config import AudioConfig
from fastdiff_tpu.models.spk_encoder import get_speaker_encoder
from fastdiff_tpu.ops.cwt import cwt_to_f0, f0_to_cwt, interp_f0
from fastdiff_tpu.ops.dsp import wav2mel_np

SR = 22050


def _speaker_wav(f0_base, formant, seed, seconds=1.2):
    """Synthetic 'speaker': harmonic source + fixed spectral envelope."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    f0 = f0_base * (1 + 0.05 * np.sin(2 * np.pi * 2.3 * t))
    phase = 2 * np.pi * np.cumsum(f0) / SR
    wav = sum(np.exp(-((k * f0_base - formant) / 400.0) ** 2)
              * np.sin(k * phase) for k in range(1, 20))
    wav += 0.01 * rng.normal(size=len(t))
    return (wav / np.abs(wav).max()).astype(np.float32)


def _embed(wav):
    cfg = AudioConfig()
    _, mel = wav2mel_np(wav, cfg)
    return get_speaker_encoder().embed(mel.T)


def test_embeddings_unit_norm_and_deterministic():
    wav = _speaker_wav(120, 800, 0)
    e1, e2 = _embed(wav), _embed(wav)
    assert e1.shape == (256,)
    np.testing.assert_allclose(np.linalg.norm(e1), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(e1, e2)


def test_same_speaker_closer_than_different():
    """Untrained d-vectors must still cluster same-'speaker' utterances."""
    spk_a = [_embed(_speaker_wav(110, 700, s)) for s in range(3)]
    spk_b = [_embed(_speaker_wav(220, 2000, s + 10)) for s in range(3)]
    within = np.mean([a @ b for i, a in enumerate(spk_a)
                      for j, b in enumerate(spk_a) if i < j])
    across = np.mean([a @ b for a in spk_a for b in spk_b])
    assert within > across + 0.05, (within, across)


def test_binarizer_emits_spk_embed(tmp_path):
    from fastdiff_tpu.data.indexed_dataset import IndexedDataset
    from fastdiff_tpu.data.tts_binarizer import TTSBinarizer
    from tests.test_tts_binarizer import _make_tts_dataset
    import os

    hp = _make_tts_dataset(tmp_path)
    hp["binarization_args"]["with_spk_embed"] = True
    TTSBinarizer(hp).process()
    ds = IndexedDataset(os.path.join(hp["binary_data_dir"], "train"))
    item = ds[0]
    assert item["spk_embed"].shape == (256,)
    assert np.isfinite(item["spk_embed"]).all()


def test_fs2_consumes_spk_embed():
    import jax
    import jax.numpy as jnp
    from fastdiff_tpu.models.fastspeech2 import (FS2Config, fastspeech2_apply,
                                                 init_fastspeech2)
    cfg = FS2Config(vocab_size=20, hidden=32, enc_layers=1, dec_layers=1,
                    num_heads=2, ffn_hidden=64, ffn_kernel=3,
                    use_pitch=False, use_spk_embed=True)
    params = init_fastspeech2(jax.random.PRNGKey(0), cfg)
    assert "spk_embed_proj" in params
    tokens = jnp.asarray([[3, 4, 5, 0]])
    mel2ph = jnp.asarray([[1, 1, 2, 3, 3, 0]])
    e1 = jnp.ones((1, 256)) / 16.0
    e2 = -e1
    out1 = fastspeech2_apply(params, tokens, cfg, mel2ph=mel2ph, spk_embed=e1)
    out2 = fastspeech2_apply(params, tokens, cfg, mel2ph=mel2ph, spk_embed=e2)
    assert not np.allclose(np.asarray(out1["mel"]), np.asarray(out2["mel"]))


# -- CWT ----------------------------------------------------------------------

def test_interp_f0():
    f0 = np.array([0, 100, 0, 0, 120, 0], np.float32)
    out = interp_f0(f0)
    assert out[0] == 100 and out[-1] == 120
    assert 100 < out[2] < 120
    assert np.all(interp_f0(np.zeros(5)) == 100.0)


def test_cwt_roundtrip_correlation():
    t = np.linspace(0, 4, 800)
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t) + 10 * np.sin(2 * np.pi * 3 * t)
    f0[100:130] = 0          # unvoiced gap
    spec, mean, std = f0_to_cwt(f0)
    assert spec.shape == (800, 10)
    recon = cwt_to_f0(spec, mean, std)
    cont = interp_f0(f0)
    corr = np.corrcoef(np.log(cont), np.log(recon))[0, 1]
    assert corr > 0.9, corr
    # scale is preserved within ~20%
    assert abs(np.median(recon) / np.median(cont) - 1) < 0.2
