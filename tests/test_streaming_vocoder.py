"""Streaming vocoder: feed-granularity invariance + batch-path identity."""

import numpy as np

import jax
import jax.numpy as jnp

from fastdiff_tpu.serving.chunked_vocoder import ChunkedVocoder
from fastdiff_tpu.serving.streaming_vocoder import StreamingVocoder

HOP = 4
CHUNK, HALO = 32, 8
CORE = CHUNK - 2 * HALO


def _noisy_sampler(key, mel, audio_length):
    """Key-dependent local 'vocoder': mel-mean upsample + keyed noise, so
    RNG handling differences between paths are visible."""
    hop = audio_length // mel.shape[1]
    cond = jnp.repeat(mel.mean(-1), hop, axis=1)
    noise = jax.random.normal(key, cond.shape) * 0.1
    return (cond + noise)[..., None]


def _stream(voc, mel, sizes):
    out, i = [], 0
    for n in sizes:
        out.append(voc.feed(mel[i: i + n]))
        i += n
    assert i == len(mel)
    out.append(voc.finish())
    return np.concatenate(out)


def test_feed_granularity_invariance():
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((150, 6)).astype(np.float32)
    key = jax.random.PRNGKey(3)

    def fresh():
        return StreamingVocoder(_noisy_sampler, HOP, CHUNK, HALO, key=key)

    one_shot = _stream(fresh(), mel, [150])
    frame_by_frame = _stream(fresh(), mel, [1] * 150)
    bursts = _stream(fresh(), mel, [7, 50, 3, 80, 10])

    assert one_shot.shape == (150 * HOP,)
    np.testing.assert_array_equal(one_shot, frame_by_frame)
    np.testing.assert_array_equal(one_shot, bursts)


def test_matches_batch_chunked_path():
    """Byte-identical to ChunkedVocoder with per-chunk stream keys."""
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((200, 6)).astype(np.float32)
    key = jax.random.PRNGKey(5)

    batch = ChunkedVocoder(_noisy_sampler, HOP, CHUNK, HALO,
                           per_chunk_keys=True).vocode(mel, key=key)
    streamed = _stream(StreamingVocoder(_noisy_sampler, HOP, CHUNK, HALO,
                                        key=key), mel, [13] * 15 + [5])
    assert streamed.shape == batch.shape
    np.testing.assert_allclose(streamed, batch, rtol=1e-6, atol=1e-6)


def test_incremental_latency_bound():
    """Samples become final within (core + halo) frames of input."""
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((120, 6)).astype(np.float32)
    voc = StreamingVocoder(_noisy_sampler, HOP, CHUNK, HALO)
    emitted = 0
    for i in range(len(mel)):
        emitted += len(voc.feed(mel[i: i + 1]))
        fed = i + 1
        lag_frames = fed - emitted // HOP
        assert lag_frames <= CORE + HALO + CHUNK, lag_frames
    emitted += len(voc.finish())
    assert emitted == 120 * HOP


def test_short_stream():
    """Streams shorter than one chunk still produce frames*hop samples."""
    mel = np.random.default_rng(3).standard_normal((10, 6)).astype(np.float32)
    voc = StreamingVocoder(_noisy_sampler, HOP, CHUNK, HALO)
    out = np.concatenate([voc.feed(mel), voc.finish()])
    assert out.shape == (10 * HOP,)
    assert np.all(np.isfinite(out))


def test_low_latency_preset_invariants():
    """The <500 ms preset keeps the granularity-invariance guarantee and
    reports its latency bound correctly."""
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((150, 6)).astype(np.float32)
    key = jax.random.PRNGKey(9)

    def fresh():
        return StreamingVocoder(_noisy_sampler, HOP, chunk_frames=48,
                                halo_frames=8, key=key)

    voc = fresh()
    assert voc.latency_frames == 40          # core 32 + halo 8
    # at the production hop/sr this is the documented sub-500 ms bound
    prod = StreamingVocoder.low_latency(_noisy_sampler, 256, key=key)
    assert prod.latency_seconds(22050) < 0.5

    one_shot = _stream(fresh(), mel, [150])
    frame_by_frame = _stream(fresh(), mel, [1] * 150)
    assert one_shot.shape == (150 * HOP,)
    np.testing.assert_array_equal(one_shot, frame_by_frame)
