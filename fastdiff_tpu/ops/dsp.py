"""Audio DSP front-end: STFT, mel filterbank, Griffin-Lim.

Numerically matches the reference's librosa-based pipeline without depending
on librosa (reference: data_gen/tts/data_gen_utils.py:93-147 `process_utterance`,
utils/audio.py:67-76 `librosa_pad_lr`, data_gen/tts/tacotron/{stft,layers,
audio_processing}.py for the Tacotron variant):

- PWG-style mels: hann window, centered constant-padded STFT, Slaney mel
  filterbank (fmin 80 / fmax 7600 / 80 bins), ``log10(max(1e-6, mel))``.
- Tacotron-style mels: reflect-padded STFT, fmin 0 / fmax 8000,
  ``ln(clamp(mel, 1e-5))``.

Two implementations share the same math:
- numpy (host): used by the multiprocess binarizer workers — no device round
  trips during preprocessing.
- jax.numpy (device): a jittable batched front-end (``mel_spectrogram_jax``)
  built on ``jnp.fft.rfft`` — frames become one FFT batch plus one MXU matmul
  against the filterbank, used for on-TPU feature extraction and Griffin-Lim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fastdiff_tpu.config import AudioConfig


# ---------------------------------------------------------------------------
# Mel filterbank (librosa-compatible: Slaney mel scale + Slaney normalization)
# ---------------------------------------------------------------------------

def hz_to_mel(frequencies):
    """Slaney mel scale (linear below 1 kHz, log above)."""
    frequencies = np.asarray(frequencies, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = frequencies / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = frequencies >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(frequencies, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz(mels):
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@functools.lru_cache(maxsize=16)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float, fmax: float) -> np.ndarray:
    """Triangular mel filterbank, (n_mels, 1 + n_fft//2), float32.

    Matches ``librosa.filters.mel`` defaults (htk=False, norm='slaney'),
    the basis the reference builds at data_gen/tts/data_gen_utils.py:130.
    """
    if fmax <= 0:
        fmax = sample_rate / 2.0
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style energy normalization.
    enorm = 2.0 / (hz_pts[2: n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=16)
def hann_window(win_size: int, n_fft: int) -> np.ndarray:
    """Periodic hann window, zero-padded (centered) to n_fft."""
    n = np.arange(win_size, dtype=np.float64)
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_size)
    if n_fft > win_size:
        lpad = (n_fft - win_size) // 2
        win = np.pad(win, (lpad, n_fft - win_size - lpad))
    return win.astype(np.float32)


# ---------------------------------------------------------------------------
# Host (numpy) implementation — used by preprocessing workers
# ---------------------------------------------------------------------------

def stft_magnitude_np(wav: np.ndarray, n_fft: int, hop_size: int,
                      win_size: int, pad_mode: str = "constant") -> np.ndarray:
    """Centered STFT magnitude |X|, shape (1 + n_fft//2, frames)."""
    wav = np.asarray(wav, dtype=np.float32)
    pad = n_fft // 2
    if pad_mode == "constant":
        padded = np.pad(wav, (pad, pad), mode="constant")
    else:
        padded = np.pad(wav, (pad, pad), mode="reflect")
    n_frames = 1 + (len(padded) - n_fft) // hop_size
    shape = (n_frames, n_fft)
    strides = (padded.strides[0] * hop_size, padded.strides[0])
    frames = np.lib.stride_tricks.as_strided(padded, shape=shape, strides=strides)
    window = hann_window(win_size, n_fft)
    spec = np.fft.rfft(frames * window[None, :], axis=-1)
    return np.abs(spec).T.astype(np.float32)


def wav2mel_np(wav: np.ndarray, cfg: AudioConfig, return_linear: bool = False):
    """Reference ``process_utterance`` semantics: (padded wav, log-mel).

    Returns ``wav`` zero-padded on the right to ``frames * hop`` samples and
    ``mel`` of shape (n_mels, frames). Matches
    data_gen/tts/data_gen_utils.py:122-147: constant STFT padding for the
    pwg front-end, reflect for tacotron; log10/ln compression respectively.
    With ``return_linear`` also returns the raw magnitude STFT (bins, frames)
    (the reference's with_linear binarization path, data_gen_utils.py:141-147).
    """
    pad_mode = "constant" if cfg.mel_compression == "log10" else "reflect"
    spc = stft_magnitude_np(wav, cfg.fft_size, cfg.hop_size, cfg.win_size, pad_mode)
    basis = mel_filterbank(cfg.sample_rate, cfg.fft_size, cfg.num_mels,
                           cfg.fmin, cfg.fmax)
    mel = basis @ spc
    if cfg.mel_compression == "log10":
        mel = np.log10(np.maximum(cfg.mel_eps, mel))
    else:
        mel = np.log(np.maximum(cfg.mel_eps, mel))
    # Right-pad the wav to exactly frames*hop (utils/audio.py:67-76 rule).
    n = wav.shape[0]
    r_pad = (n // cfg.hop_size + 1) * cfg.hop_size - n
    wav = np.pad(wav, (0, r_pad), mode="constant")
    wav = wav[: mel.shape[1] * cfg.hop_size]
    if return_linear:
        return (wav.astype(np.float32), mel.astype(np.float32),
                spc.astype(np.float32))
    return wav.astype(np.float32), mel.astype(np.float32)


# ---------------------------------------------------------------------------
# Device (jax.numpy) implementation — jittable, batched
# ---------------------------------------------------------------------------

def frame_signal(wav: jnp.ndarray, n_fft: int, hop_size: int,
                 pad_mode: str = "constant") -> jnp.ndarray:
    """Center-pad and frame a batch of waveforms: (B, T) -> (B, frames, n_fft)."""
    pad = n_fft // 2
    mode = "constant" if pad_mode == "constant" else "reflect"
    padded = jnp.pad(wav, ((0, 0), (pad, pad)), mode=mode)
    n_frames = 1 + (padded.shape[-1] - n_fft) // hop_size
    idx = (jnp.arange(n_frames)[:, None] * hop_size
           + jnp.arange(n_fft)[None, :])
    return padded[:, idx]


def stft_magnitude_jax(wav: jnp.ndarray, n_fft: int, hop_size: int,
                       win_size: int, pad_mode: str = "constant") -> jnp.ndarray:
    """Batched STFT magnitude: (B, T) -> (B, 1 + n_fft//2, frames)."""
    frames = frame_signal(wav, n_fft, hop_size, pad_mode)
    window = jnp.asarray(hann_window(win_size, n_fft))
    spec = jnp.fft.rfft(frames * window[None, None, :], axis=-1)
    return jnp.abs(spec).swapaxes(-1, -2)


def mel_spectrogram_jax(wav: jnp.ndarray, cfg: AudioConfig) -> jnp.ndarray:
    """Batched log-mel front-end on device: (B, T) -> (B, n_mels, frames)."""
    pad_mode = "constant" if cfg.mel_compression == "log10" else "reflect"
    spc = stft_magnitude_jax(wav, cfg.fft_size, cfg.hop_size, cfg.win_size, pad_mode)
    basis = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.fft_size,
                                       cfg.num_mels, cfg.fmin, cfg.fmax))
    mel = jnp.einsum("mf,bft->bmt", basis, spc)
    if cfg.mel_compression == "log10":
        return jnp.log10(jnp.maximum(cfg.mel_eps, mel))
    return jnp.log(jnp.maximum(cfg.mel_eps, mel))


@functools.lru_cache(maxsize=16)
def _window_sumsquare(n_fft: int, hop_size: int, win_size: int,
                      n_frames: int) -> np.ndarray:
    """Host-precomputed overlap-added squared-window envelope (constant)."""
    win = hann_window(win_size, n_fft).astype(np.float64) ** 2
    total = n_fft + hop_size * (n_frames - 1)
    out = np.zeros(total)
    for f in range(n_frames):
        out[f * hop_size: f * hop_size + n_fft] += win
    return np.maximum(out, 1e-8).astype(np.float32)


def istft_jax(spec: jnp.ndarray, phase: jnp.ndarray, n_fft: int, hop_size: int,
              win_size: int, length: int) -> jnp.ndarray:
    """Inverse STFT by windowed overlap-add with window-sum normalization.

    (B, bins, frames) magnitude + phase -> (B, length). Overlap-add is
    vectorized as ``n_fft/hop`` shifted reshape-adds (no scan, no scatters):
    each frame splits into subframes of ``hop`` samples; subframe k of frame
    f lands at output block f+k. Requires ``n_fft % hop == 0`` (true for the
    reference's 1024/256 configuration).
    """
    assert n_fft % hop_size == 0, "istft requires hop | n_fft"
    ratio = n_fft // hop_size
    window = jnp.asarray(hann_window(win_size, n_fft))
    complex_spec = spec * jnp.exp(1j * phase)
    frames = jnp.fft.irfft(complex_spec.swapaxes(-1, -2), n=n_fft, axis=-1)
    frames = frames * window[None, None, :]          # (B, F, n_fft)

    b, n_frames, _ = frames.shape
    total = n_fft + hop_size * (n_frames - 1)
    buf = jnp.zeros((b, total), dtype=frames.dtype)
    for k in range(ratio):
        sub = frames[:, :, k * hop_size: (k + 1) * hop_size]   # (B, F, hop)
        flat = sub.reshape(b, n_frames * hop_size)
        buf = buf.at[:, k * hop_size: k * hop_size + n_frames * hop_size].add(flat)
    wsum = jnp.asarray(_window_sumsquare(n_fft, hop_size, win_size, n_frames))
    buf = buf / wsum[None, :]
    pad = n_fft // 2
    return buf[:, pad: pad + length]


def griffin_lim_jax(magnitude: jnp.ndarray, cfg: AudioConfig, n_iters: int = None,
                    key: jax.Array = None) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction (reference: utils/audio.py griffin_lim
    and vocoders/gl_*.py), as a lax.fori_loop on device."""
    if n_iters is None:
        n_iters = cfg.griffin_lim_iters
    if key is None:
        key = jax.random.PRNGKey(0)
    b, bins, frames = magnitude.shape
    length = frames * cfg.hop_size
    phase = jax.random.uniform(key, (b, bins, frames), minval=-np.pi, maxval=np.pi)

    def body(_, phase):
        wav = istft_jax(magnitude, phase, cfg.fft_size, cfg.hop_size,
                        cfg.win_size, length)
        spec = frame_signal(wav, cfg.fft_size, cfg.hop_size, "constant")
        window = jnp.asarray(hann_window(cfg.win_size, cfg.fft_size))
        cplx = jnp.fft.rfft(spec * window[None, None, :], axis=-1).swapaxes(-1, -2)
        return jnp.angle(cplx)[:, :, :frames]

    phase = jax.lax.fori_loop(0, n_iters, body, phase)
    return istft_jax(magnitude, phase, cfg.fft_size, cfg.hop_size,
                     cfg.win_size, length)


# ---------------------------------------------------------------------------
# Mel denormalization helpers (inverse of the compression)
# ---------------------------------------------------------------------------

def mel_to_linear_np(mel: np.ndarray, cfg: AudioConfig) -> np.ndarray:
    """Approximate inverse of the mel projection via the filterbank pseudo-inverse."""
    basis = mel_filterbank(cfg.sample_rate, cfg.fft_size, cfg.num_mels,
                           cfg.fmin, cfg.fmax)
    inv = np.linalg.pinv(basis)
    if cfg.mel_compression == "log10":
        amp = np.power(10.0, mel)
    else:
        amp = np.exp(mel)
    return np.maximum(1e-10, inv @ amp).astype(np.float32)
