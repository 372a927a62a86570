"""Batched, mesh-sharded vocoding — the TPU-native serving path.

The reference vocoder infers strictly one utterance per batch
(reference: tasks/vocoder/dataset_utils.py:56, config max_valid_sentences=1);
throughput scaling there means more GPUs with DDP. Here a *batch* of
utterances is bucket-padded to shared lengths, stacked, and the whole
reverse-diffusion scan runs once per bucket with the batch dimension
NamedSharding'ed over the ``dp`` mesh axis — XLA executes every chip on its
shard with zero communication (vocoding is embarrassingly parallel; the
mesh is how it rides ICI on a slice).

Length bucketing keeps recompiles bounded: mel frame counts are padded up
to multiples of ``frame_bucket`` (compile cache keyed on padded length),
and outputs are trimmed back to ``frames * hop`` samples.
"""

from __future__ import annotations

from typing import Optional, Callable, List

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.diffusion.sampler import inference_key, make_sampler
from fastdiff_tpu.parallel import mesh as meshlib


class BatchedVocoder:
    def __init__(self, denoise_fn: Callable, constants, hop_size: int,
                 mesh=None, frame_bucket: int = 128,
                 max_batch: Optional[int] = None):
        """denoise_fn(x, mel, t) -> eps; constants from
        sampler_constants_for_schedule.

        ``max_batch`` defaults to the dp mesh size, i.e. PER-DEVICE BATCH
        1: on-chip batching anti-scales at these thin-channel shapes
        (488x aggregate realtime at batch 1 vs 225x at batch 4 on one
        chip — docs/PERF.md), so extra utterances run as additional
        rounds instead of fatter batches. Raise it only after measuring.
        """
        self.sampler = make_sampler(denoise_fn, constants)
        self.hop = hop_size
        self.mesh = mesh or meshlib.make_mesh()
        self.frame_bucket = frame_bucket
        self.max_batch = (max_batch if max_batch is not None
                          else self.mesh.shape.get("dp", 1))

    @classmethod
    def from_sampler(cls, sampler: Callable, hop_size: int, mesh=None,
                     frame_bucket: int = 128, max_batch: Optional[int] = None):
        """Wrap an existing jitted ``sampler(key, mel, audio_length)``."""
        self = cls.__new__(cls)
        self.sampler = sampler
        self.hop = hop_size
        self.mesh = mesh or meshlib.make_mesh()
        self.frame_bucket = frame_bucket
        self.max_batch = (max_batch if max_batch is not None
                          else self.mesh.shape.get("dp", 1))
        return self

    def _bucket(self, frames: int) -> int:
        b = self.frame_bucket
        return ((frames + b - 1) // b) * b

    def vocode(self, mels: List[np.ndarray], key=None) -> List[np.ndarray]:
        """mels: list of (T_i, n_mels) arrays -> list of (T_i * hop,) wavs."""
        if key is None:
            key = inference_key(0)   # TPU hardware RNG for noise draws
        # group indices by padded length bucket
        buckets = {}
        for i, mel in enumerate(mels):
            buckets.setdefault(self._bucket(mel.shape[0]), []).append(i)

        out: List[np.ndarray] = [None] * len(mels)
        dp = self.mesh.shape.get("dp", 1)
        for padded_frames, idxs in sorted(buckets.items()):
            for start in range(0, len(idxs), self.max_batch):
                chunk = idxs[start: start + self.max_batch]
                # pad the batch dim up to a dp multiple so it shards evenly
                batch = len(chunk)
                padded_batch = ((batch + dp - 1) // dp) * dp
                stack = np.zeros((padded_batch, padded_frames,
                                  mels[chunk[0]].shape[1]), np.float32)
                for row, i in enumerate(chunk):
                    stack[row, : mels[i].shape[0]] = mels[i]
                key, sub = jax.random.split(key)
                mel_dev = jax.device_put(
                    jnp.asarray(stack), meshlib.batch_sharding(self.mesh))
                wavs = self.sampler(sub, mel_dev, padded_frames * self.hop)
                wavs = np.asarray(wavs)[..., 0]
                for row, i in enumerate(chunk):
                    out[i] = wavs[row, : mels[i].shape[0] * self.hop]
        return out
