"""Streaming vocoder: incremental mel -> waveform synthesis.

The remaining TPU-native serving feature on top of the chunked path
(fastdiff_tpu/serving/chunked_vocoder.py): a *stateful* API that accepts mel
frames as they are produced (e.g. by an autoregressive acoustic model) and
emits finalized waveform samples with bounded latency, carrying the
crossfade halo forward chunk-to-chunk. The reference has no streaming story
at all — it vocodes whole utterances in batch-1 calls (reference:
tasks/vocoder/dataset_utils.py:56, FastDiff.py:98-118).

Guarantees:
- output is *independent of feed granularity*: feeding frame-by-frame,
  in bursts, or everything at once produces byte-identical waveforms
  (per-chunk RNG keys are derived from the stream position, not arrival),
- identical to the batch ``ChunkedVocoder`` result when that runs with the
  same per-chunk keys (``per_chunk_keys=True``),
- O(1) memory in stream length; one compiled sampler shape;
- latency bound: a sample is finalized once the next chunk can no longer
  touch it — worst case ``(core + halo)`` frames (~3 s at the defaults)
  behind the newest fed frame.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.diffusion.sampler import inference_key
from fastdiff_tpu.serving.chunked_vocoder import DEFAULT_HALO_FRAMES


def crossfade_window(core_s: int, halo_s: int) -> np.ndarray:
    """Equal-power sin^2 crossfade over one halo width (matches
    ChunkedVocoder.vocode)."""
    ramp = np.sin(0.5 * np.pi * np.linspace(0, 1, halo_s)) ** 2
    win = np.ones(core_s + 2 * halo_s, np.float32)
    win[:halo_s] = ramp
    win[-halo_s:] = ramp[::-1]
    return win


class StreamingVocoder:
    def __init__(self, sampler: Callable, hop_size: int,
                 chunk_frames: int = 256,
                 halo_frames: int = DEFAULT_HALO_FRAMES,
                 key: Optional[jax.Array] = None):
        """sampler(key, mel (1, F, n_mels), audio_length) -> (1, L, 1)."""
        assert chunk_frames > 2 * halo_frames
        self.sampler = sampler
        self.hop = hop_size
        self.chunk = chunk_frames
        self.halo = halo_frames
        self.core = chunk_frames - 2 * halo_frames
        self.key = key if key is not None else inference_key(0)

        self._mel_buf: Optional[np.ndarray] = None   # all frames seen so far,
        self._consumed = 0                           # minus what chunks used
        self._chunk_idx = 0
        self._total_frames = 0
        # overlap-add state: samples >= self._final_s are still mutable
        self._tail = np.zeros(0, np.float32)
        self._tail_w = np.zeros(0, np.float32)
        self._final_s = 0                            # finalized sample count
        self._finished = False

    # -- latency accounting -----------------------------------------------
    @property
    def latency_frames(self) -> int:
        """Worst-case finalization latency in mel frames: a sample is final
        once the next chunk cannot touch it -> (core + halo) frames behind
        the newest fed frame."""
        return self.core + self.halo

    def latency_seconds(self, sample_rate: int) -> float:
        return self.latency_frames * self.hop / sample_rate

    @classmethod
    def low_latency(cls, sampler: Callable, hop_size: int,
                    key: Optional[jax.Array] = None) -> "StreamingVocoder":
        """Sub-500 ms finalization preset: chunk 48 / halo 8 -> latency
        (32 + 8) frames = 464 ms at hop 256 / 22.05 kHz.

        The halo is half the conservative receptive-field default
        (chunked_vocoder.DEFAULT_HALO_FRAMES = 16), so chunk seams lose
        some long-context conditioning — the measured quality delta vs the
        batch path is published in docs/PERF.md (scripts/
        streaming_latency_curve.py); correctness invariants are unchanged.
        """
        return cls(sampler, hop_size, chunk_frames=48, halo_frames=8,
                   key=key)

    # -- internals -----------------------------------------------------------
    def _chunk_key(self, idx: int) -> jax.Array:
        return jax.random.fold_in(self.key, idx)

    def _vocode_chunk(self, mel_chunk: np.ndarray, idx: int) -> np.ndarray:
        wav = self.sampler(self._chunk_key(idx), jnp.asarray(mel_chunk)[None],
                           self.chunk * self.hop)
        return np.asarray(wav)[0, :, 0]

    def _emit_chunk(self, mel_chunk: np.ndarray) -> np.ndarray:
        """Overlap-add one haloed chunk; return newly finalized samples."""
        i = self._chunk_idx
        self._chunk_idx += 1
        core_s, halo_s = self.core * self.hop, self.halo * self.hop
        win = crossfade_window(core_s, halo_s)
        seg = self._vocode_chunk(mel_chunk, i) * win

        start = i * core_s - halo_s                   # global sample position
        if start < 0:                                 # first chunk: clip halo
            seg, win = seg[-start:], win[-start:]
            start = 0
        # grow the mutable tail to cover this segment
        end = start + len(seg)
        lo = self._final_s
        need = end - lo
        if len(self._tail) < need:
            pad = need - len(self._tail)
            self._tail = np.concatenate([self._tail, np.zeros(pad, np.float32)])
            self._tail_w = np.concatenate([self._tail_w,
                                           np.zeros(pad, np.float32)])
        off = start - lo
        self._tail[off: off + len(seg)] += seg
        self._tail_w[off: off + len(seg)] += win

        # samples the NEXT chunk can still touch start at (i+1)*core - halo
        safe_end = (i + 1) * core_s - halo_s
        n_final = max(0, safe_end - lo)
        out = self._tail[:n_final] / np.maximum(self._tail_w[:n_final], 1e-8)
        self._tail = self._tail[n_final:]
        self._tail_w = self._tail_w[n_final:]
        self._final_s = safe_end
        return out

    def _ready_chunk(self) -> Optional[np.ndarray]:
        """Mel window for the next chunk if enough frames arrived."""
        i = self._chunk_idx
        lo = i * self.core - self.halo
        hi = lo + self.chunk
        if self._mel_buf is None or self._total_frames < hi:
            return None
        buf_lo = lo - self._consumed
        if buf_lo < 0:                                # left edge padding
            pad = np.repeat(self._mel_buf[:1], -buf_lo, axis=0)
            window = np.concatenate([pad, self._mel_buf[: hi - self._consumed]])
        else:
            window = self._mel_buf[buf_lo: hi - self._consumed]
        # drop frames no future chunk needs: next chunk starts at
        # (i+1)*core - halo
        keep_from = max(0, (i + 1) * self.core - self.halo - self._consumed)
        self._mel_buf = self._mel_buf[keep_from:]
        self._consumed += keep_from
        return window

    # -- public API -----------------------------------------------------------
    def feed(self, mel_frames: np.ndarray) -> np.ndarray:
        """Feed (T, n_mels) new frames; returns newly finalized samples."""
        assert not self._finished, "feed() after finish()"
        mel_frames = np.asarray(mel_frames, np.float32)
        if mel_frames.ndim == 1:
            mel_frames = mel_frames[None, :]
        self._mel_buf = (mel_frames if self._mel_buf is None
                         else np.concatenate([self._mel_buf, mel_frames]))
        self._total_frames += len(mel_frames)
        out = []
        while (window := self._ready_chunk()) is not None:
            out.append(self._emit_chunk(window))
        return np.concatenate(out) if out else np.zeros(0, np.float32)

    def finish(self) -> np.ndarray:
        """Flush: vocode the remaining partial chunk (edge-padded) and return
        all remaining samples. Total stream output is total_frames * hop."""
        assert not self._finished, "finish() called twice"
        self._finished = True
        total_s = self._total_frames * self.hop
        out = []
        # emit remaining full/partial chunks with edge padding on the right
        while self._final_s < total_s and self._mel_buf is not None \
                and len(self._mel_buf) > 0:
            i = self._chunk_idx
            lo = i * self.core - self.halo
            buf_lo = lo - self._consumed
            window = self._mel_buf[max(0, buf_lo):]
            if buf_lo < 0:
                pad = np.repeat(self._mel_buf[:1], -buf_lo, axis=0)
                window = np.concatenate([pad, window])
            if len(window) < self.chunk:              # right edge padding
                pad = np.repeat(window[-1:], self.chunk - len(window), axis=0)
                window = np.concatenate([window, pad])
            else:
                window = window[: self.chunk]
            keep_from = max(0, (i + 1) * self.core - self.halo - self._consumed)
            self._mel_buf = self._mel_buf[keep_from:]
            self._consumed += keep_from
            out.append(self._emit_chunk(window))
        # whatever is still mutable is now final
        if self._final_s < total_s:
            n = total_s - self._final_s
            tail = self._tail[:n] / np.maximum(self._tail_w[:n], 1e-8)
            out.append(tail)
            self._final_s = total_s
        full = np.concatenate(out) if out else np.zeros(0, np.float32)
        # the last chunk was edge-padded past the true stream end — trim
        overshoot = self._final_s - total_s
        if overshoot > 0:
            full = full[:-overshoot] if overshoot < len(full) else full[:0]
        return full
