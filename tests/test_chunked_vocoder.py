"""Chunked vocoding: length handling, determinism w.r.t. a linear sampler."""

import numpy as np

import jax
import jax.numpy as jnp

from fastdiff_tpu.serving.chunked_vocoder import ChunkedVocoder


def _linear_sampler(key, mel, audio_length):
    """Deterministic, local 'vocoder': upsample mel mean by hop (no noise) —
    chunked and unchunked outputs must then agree away from edges."""
    hop = audio_length // mel.shape[1]
    cond = jnp.repeat(mel.mean(-1), hop, axis=1)
    return cond[..., None]


def test_short_input_single_call():
    voc = ChunkedVocoder(_linear_sampler, hop_size=4, chunk_frames=64,
                         halo_frames=8)
    mel = np.random.default_rng(0).standard_normal((50, 6)).astype(np.float32)
    wav = voc.vocode(mel)
    assert wav.shape == (200,)


def test_chunked_matches_unchunked_for_local_sampler():
    hop = 4
    voc = ChunkedVocoder(_linear_sampler, hop_size=hop, chunk_frames=32,
                         halo_frames=8)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((150, 6)).astype(np.float32)   # forces chunking
    wav = voc.vocode(mel)
    want = np.asarray(_linear_sampler(None, jnp.asarray(mel)[None],
                                      150 * hop))[0, :, 0]
    assert wav.shape == want.shape
    np.testing.assert_allclose(wav, want, rtol=1e-4, atol=1e-5)


def test_distributed_chunks_sharded_over_mesh():
    """Chunk axis shards over the 8-device mesh; result matches the local
    chunked path exactly for a deterministic sampler."""
    from fastdiff_tpu.serving.chunked_vocoder import DistributedChunkedVocoder
    hop = 4
    local = ChunkedVocoder(_linear_sampler, hop_size=hop, chunk_frames=32,
                           halo_frames=8)
    dist = DistributedChunkedVocoder(_linear_sampler, hop_size=hop,
                                     chunk_frames=32, halo_frames=8)
    assert dist.mesh.devices.size == 8
    mel = np.random.default_rng(2).standard_normal((200, 6)).astype(np.float32)
    np.testing.assert_allclose(dist.vocode(mel), local.vocode(mel),
                               rtol=1e-5, atol=1e-6)


def test_odd_lengths():
    voc = ChunkedVocoder(_linear_sampler, hop_size=4, chunk_frames=32,
                         halo_frames=4)
    for frames in (33, 57, 100, 129):
        mel = np.ones((frames, 6), np.float32)
        wav = voc.vocode(mel)
        assert wav.shape == (frames * 4,)
        assert np.isfinite(wav).all()
