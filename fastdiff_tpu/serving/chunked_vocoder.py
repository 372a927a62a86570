"""Chunked long-utterance vocoding: time-axis splitting with halo overlap.

The reference handles long waveforms by training on random crops and
inferring whole utterances in one shot (reference: tasks/vocoder/
dataset_utils.py:114-131, config max_frames=1548) — memory and compile
shapes grow with utterance length. Every op in the FastDiff denoiser is
*local* (convs with bounded receptive field, frame-local LVC kernels;
SURVEY.md §5.7), so a TPU-native alternative exists: split the mel into
fixed-size chunks with a halo equal to the receptive field, vocode all
chunks as ONE batch (optionally dp-sharded over the mesh via
BatchedVocoder-style stacking), and overlap-add the waveforms with an
equal-power crossfade across halo regions to mask the per-chunk sampler
noise.

Benefits: O(1) memory in utterance length, a single compiled shape for any
input length, and chunk-level parallelism across chips — sequence scaling
as sharding of independent local windows instead of ring collectives
(appropriate because there is no attention and no global context).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.diffusion.sampler import inference_key

# FastDiff receptive field in mel frames: kernel-predictor context (~9
# frames) plus sample-level conv stacks (< 2 frames at hop 256); 16 frames
# (~0.19 s) gives a comfortable margin.
DEFAULT_HALO_FRAMES = 16


class ChunkedVocoder:
    def __init__(self, sampler: Callable, hop_size: int,
                 chunk_frames: int = 256, halo_frames: int = DEFAULT_HALO_FRAMES,
                 per_chunk_keys: bool = False):
        """sampler(key, mel (B, F, n_mels), audio_length) -> (B, L, 1).

        ``per_chunk_keys`` draws each chunk's noise from a stream-position-
        derived key (fold_in(key, chunk_idx)) in per-chunk sampler calls
        instead of one batched call — bit-identical to the incremental
        ``StreamingVocoder`` and O(1) memory, at the cost of batching.
        """
        assert chunk_frames > 2 * halo_frames
        self.sampler = sampler
        self.hop = hop_size
        self.chunk = chunk_frames
        self.halo = halo_frames
        self.per_chunk_keys = per_chunk_keys

    def vocode(self, mel: np.ndarray, key=None) -> np.ndarray:
        """mel (T, n_mels) -> wav (T * hop,). Short inputs go through in
        one call; long inputs are chunked and crossfaded."""
        if key is None:
            key = inference_key(0)   # TPU hardware RNG for noise draws
        frames = mel.shape[0]
        core = self.chunk - 2 * self.halo
        if frames <= self.chunk:
            wav = self.sampler(key, jnp.asarray(mel)[None], frames * self.hop)
            return np.asarray(wav)[0, :, 0]

        n_chunks = int(np.ceil(frames / core))
        padded_frames = n_chunks * core + 2 * self.halo
        mel_pad = np.pad(mel, ((self.halo, padded_frames - frames - self.halo),
                               (0, 0)), mode="edge")
        # stack all chunks into one batch: chunk i covers core window
        # [i*core, (i+1)*core) with halo on both sides
        chunks = np.stack([
            mel_pad[i * core: i * core + self.chunk] for i in range(n_chunks)
        ])                                              # (n_chunks, chunk, M)
        if self.per_chunk_keys:
            wavs = np.stack([
                np.asarray(self.sampler(jax.random.fold_in(key, i),
                                        jnp.asarray(chunks[i])[None],
                                        self.chunk * self.hop))[0, :, 0]
                for i in range(n_chunks)])
        else:
            wavs = self.sampler(key, jnp.asarray(chunks), self.chunk * self.hop)
            wavs = np.asarray(wavs)[..., 0]             # (n_chunks, chunk*hop)

        halo_s = self.halo * self.hop
        core_s = core * self.hop
        out = np.zeros(n_chunks * core_s, np.float32)
        weight = np.zeros_like(out)
        # equal-power crossfade ramp across one halo width
        ramp = np.sin(0.5 * np.pi * np.linspace(0, 1, halo_s)) ** 2
        win = np.ones(core_s + 2 * halo_s, np.float32)
        win[:halo_s] = ramp
        win[-halo_s:] = ramp[::-1]
        for i in range(n_chunks):
            seg = wavs[i] * win
            start = i * core_s - halo_s
            lo = max(0, start)
            seg_lo = lo - start
            hi = min(len(out), start + len(seg))
            out[lo:hi] += seg[seg_lo: seg_lo + hi - lo]
            weight[lo:hi] += win[seg_lo: seg_lo + hi - lo]
        out = out / np.maximum(weight, 1e-8)
        return out[: frames * self.hop]


class DistributedChunkedVocoder(ChunkedVocoder):
    """Sequence-parallel chunked vocoding: the chunk axis is sharded over the
    device mesh, so one long utterance spreads across all chips.

    This is the framework's sequence-parallelism story (SURVEY.md §5.7): the
    model has no attention and a bounded receptive field, so sharding the
    time axis reduces to sharding *independent haloed windows* — the chunk
    batch is placed with a NamedSharding over the mesh's first axis and XLA
    runs each chip on its shard with zero collectives. Chunk count is padded
    to a multiple of the axis size so the sharding is even.
    """

    def __init__(self, sampler: Callable, hop_size: int, mesh=None,
                 chunk_frames: int = 256,
                 halo_frames: int = DEFAULT_HALO_FRAMES):
        super().__init__(sampler, hop_size, chunk_frames, halo_frames)
        from fastdiff_tpu.parallel import mesh as meshlib
        self.mesh = mesh or meshlib.make_mesh()
        self._meshlib = meshlib
        base_sampler = self.sampler

        def sharded_sampler(key, mel_chunks, audio_length):
            n = mel_chunks.shape[0]
            axis = self.mesh.axis_names[0]
            width = self.mesh.shape[axis]
            pad = (-n) % width
            if pad:
                mel_chunks = jnp.concatenate(
                    [mel_chunks, jnp.zeros((pad,) + mel_chunks.shape[1:],
                                           mel_chunks.dtype)], axis=0)
            mel_dev = jax.device_put(
                mel_chunks, self._meshlib.batch_sharding(self.mesh, axis))
            wavs = base_sampler(key, mel_dev, audio_length)
            return wavs[:n]

        self.sampler = sharded_sampler
