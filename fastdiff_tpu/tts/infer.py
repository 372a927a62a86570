"""End-to-end TTS inference glue: acoustic model -> FastDiff vocoder.

The reference's demo pipeline (reference: egs/demo_tts.py:5-29,
egs/tts/base_tts_infer.py) clones external acoustic-model repos
(PortaSpeech / FastSpeech2 / DiffSpeech), has them dump ``infer_out/*.npy``
mels, then invokes the vocoder with ``--infer test_mel_dir=...``. This module
provides the same two integration points without subprocess glue:

- ``BaseTTSInfer``: the adapter contract an acoustic model implements
  (text -> mel), with the text front-end (normalize -> phonemes -> ids)
  already wired (reference: egs/tts/base_tts_infer.py preprocess_input).
- ``TTSPipeline``: chains any ``BaseTTSInfer`` into any registry vocoder and
  writes wavs — the library-level equivalent of demo_tts.py.
- mel-directory input (``.npy`` files) remains available through the main
  CLI: ``python -m fastdiff_tpu.run --infer --hparams 'test_mel_dir=...'``.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from fastdiff_tpu.text.encoder import TokenTextEncoder
from fastdiff_tpu.text.processors import get_txt_processor_cls
from fastdiff_tpu.utils import audio_io
from fastdiff_tpu.vocoders.base import get_vocoder_cls


class BaseTTSInfer:
    """Adapter contract for acoustic models (text -> mel).

    Subclasses implement ``forward_model(token_ids) -> mel (T, n_mels)``.
    """

    def __init__(self, hparams: dict, token_encoder: Optional[TokenTextEncoder] = None):
        self.hparams = hparams
        self.txt_processor = get_txt_processor_cls(
            hparams.get("pre_align_args", {}).get("txt_processor", "en"))
        self.token_encoder = token_encoder

    def preprocess_input(self, text: str) -> dict:
        phones, norm_text = self.txt_processor.process(text)
        item = {"text": text, "norm_text": norm_text, "phones": phones}
        if self.token_encoder is not None:
            item["token_ids"] = self.token_encoder.encode(" ".join(phones))
        return item

    def forward_model(self, token_ids: List[int]) -> np.ndarray:
        raise NotImplementedError

    def infer_once(self, text: str) -> np.ndarray:
        item = self.preprocess_input(text)
        return self.forward_model(item.get("token_ids", item["phones"]))


class NpyMelSource(BaseTTSInfer):
    """'Acoustic model' that replays precomputed mels from a directory —
    the adapter used when an external model has already dumped
    ``infer_out/*.npy`` (demo_tts.py:23-29 flow)."""

    def __init__(self, hparams: dict, mel_dir: str):
        super().__init__(hparams)
        self.mel_paths = sorted(
            os.path.join(mel_dir, f) for f in os.listdir(mel_dir)
            if f.endswith(".npy"))
        self._i = 0

    def infer_once(self, text: str = "") -> np.ndarray:
        mel = np.load(self.mel_paths[self._i % len(self.mel_paths)])
        self._i += 1
        return np.asarray(mel, np.float32)


class TTSPipeline:
    """text (or mel source) -> vocoder -> wav files."""

    def __init__(self, hparams: dict, acoustic: BaseTTSInfer):
        self.hparams = hparams
        self.acoustic = acoustic
        self.vocoder = get_vocoder_cls(hparams)(hparams)
        self.sample_rate = int(hparams.get("audio_sample_rate", 22050))

    def synthesize(self, text: str, out_wav: Optional[str] = None) -> np.ndarray:
        mel = self.acoustic.infer_once(text)          # (T, n_mels)
        wav = self.vocoder.spec2wav(mel)
        wav = wav / max(1e-9, np.abs(wav).max())
        if out_wav:
            os.makedirs(os.path.dirname(out_wav) or ".", exist_ok=True)
            audio_io.save_wav(wav, out_wav, self.sample_rate)
        return wav
