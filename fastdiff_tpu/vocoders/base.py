"""Vocoder registry: name -> vocoder class, with dotted-path fallback.

Same contract as the reference registry (reference: vocoders/base_vocoder.py:
3-40): ``@register_vocoder`` classes are looked up case-insensitively by
``hparams['vocoder']``; unknown names are resolved as dotted import paths.
Every vocoder exposes ``spec2wav`` (mel -> waveform) and the canonical
``wav2spec`` front-end (shared with binarization, so analysis and synthesis
always agree on mel parameters — the reference routes both through
PWG.wav2spec, vocoders/pwg.py:107-124).
"""

from __future__ import annotations

import importlib

import numpy as np

VOCODERS = {}


def register_vocoder(cls):
    VOCODERS[cls.__name__.lower()] = cls
    return cls


def get_vocoder_cls(hparams: dict):
    name = str(hparams.get("vocoder", "fastdiff")).lower()
    if name in VOCODERS:
        return VOCODERS[name]
    pkg, cls_name = hparams["vocoder"].rsplit(".", 1)
    return getattr(importlib.import_module(pkg), cls_name)


class BaseVocoder:
    def __init__(self, hparams: dict = None):
        self.hparams = hparams or {}

    def spec2wav(self, mel: np.ndarray, **kwargs) -> np.ndarray:
        """mel (T, n_mels) -> waveform (T * hop,)."""
        raise NotImplementedError

    @staticmethod
    def wav2spec(wav_fn, hparams: dict = None):
        """Canonical analysis front-end: wav file -> (wav, mel (T, n_mels)).

        Honors the reference ``process_utterance`` pre-processing flags
        (data_gen/tts/data_gen_utils.py:103-120): ``trim_long_sil`` (VAD
        silence clipping, which also loudness-normalizes first, as the
        reference's trim_long_silences does) and ``loud_norm`` (BS.1770
        normalization to -22 LUFS)."""
        from fastdiff_tpu.config import AudioConfig
        from fastdiff_tpu.ops.dsp import wav2mel_np
        from fastdiff_tpu.utils import audio_io
        from fastdiff_tpu.utils.hparams import hparams as global_hp
        hp = hparams if hparams is not None else global_hp
        cfg = AudioConfig.from_hparams(hp)
        wav, _ = audio_io.load_wav(wav_fn, target_sr=cfg.sample_rate)
        if hp.get("trim_long_sil"):
            from fastdiff_tpu.ops.loudness import (normalize_loudness,
                                                   trim_long_silences)
            wav = normalize_loudness(wav, cfg.sample_rate, -20.0)
            wav = trim_long_silences(wav, cfg.sample_rate)
        if hp.get("loud_norm"):
            from fastdiff_tpu.ops.loudness import normalize_loudness
            wav = normalize_loudness(wav, cfg.sample_rate, -22.0)
        wav, mel = wav2mel_np(wav, cfg)
        return wav, mel.T
