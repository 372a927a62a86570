"""Full TTS binarizer: phones + alignment + f0 on top of the vocoder records.

The TTS-path counterpart of the vocoder binarizer, covering the reference's
``BaseBinarizer`` capabilities (reference: data_gen/tts/base_binarizer.py:
26-336): phone/word encoders built from the metadata, MFA TextGrid
alignment -> ``mel2ph``/durations (via fastdiff_tpu/data/align.py), f0 +
coarse pitch (native YIN, fastdiff_tpu/ops/pitch.py), speaker-id maps, and
the same split/record/IndexedDataset conventions as the vocoder path.

Speaker *embeddings* (resemblyzer in the reference, base_binarizer.py:156-168)
are computed natively by ``fastdiff_tpu.models.spk_encoder`` when
``use_spk_embed`` is set (``with_spk_embed`` wiring in ``process_item`` below).
"""

from __future__ import annotations

import json
import os
from typing import List

import numpy as np

from fastdiff_tpu.data.align import align_textgrid
from fastdiff_tpu.data.binarizer import VocoderBinarizer, read_metadata_csv
from fastdiff_tpu.text.encoder import UNK, TokenTextEncoder


class TTSBinarizer(VocoderBinarizer):
    """metadata_phone.csv columns: item_name, wav_fn[, txt, ph, spk, tg_fn]."""

    def __init__(self, hparams: dict):
        super().__init__(hparams)
        self.item_meta = {}

    def load_meta_data(self) -> None:
        for ds_id, processed_dir in enumerate(self.processed_data_dirs):
            rows = read_metadata_csv(os.path.join(processed_dir, "metadata_phone.csv"))
            for r in rows:
                item_name = r["item_name"]
                if len(self.processed_data_dirs) > 1:
                    item_name = f"ds{ds_id}_{item_name}"
                self.item2wavfn[item_name] = r["wav_fn"]
                self.item_meta[item_name] = r
        self.item_names = sorted(self.item2wavfn.keys())

    # -- vocab -------------------------------------------------------------
    def build_phone_encoder(self) -> TokenTextEncoder:
        """Collect the phone set over all items and persist it
        (base_binarizer.py phone-dict behavior)."""
        out_dir = self.hparams["binary_data_dir"]
        os.makedirs(out_dir, exist_ok=True)
        phone_set_fn = os.path.join(out_dir, "phone_set.json")
        if os.path.exists(phone_set_fn) and not self.binarization_args.get(
                "reset_phone_dict", True):
            tokens = json.load(open(phone_set_fn))
        else:
            phones = set()
            for meta in self.item_meta.values():
                for p in str(meta.get("ph", "")).split():
                    phones.add(p)
            tokens = sorted(phones)
            json.dump(tokens, open(phone_set_fn, "w"))
        return TokenTextEncoder(vocab_list=tokens, replace_oov=UNK)

    def build_spk_map(self) -> dict:
        out_dir = self.hparams["binary_data_dir"]
        spk_map_fn = os.path.join(out_dir, "spk_map.json")
        spks = sorted({str(m.get("spk", "SPK0")) for m in self.item_meta.values()})
        spk_map = {s: i for i, s in enumerate(spks)}
        os.makedirs(out_dir, exist_ok=True)
        json.dump(spk_map, open(spk_map_fn, "w"))
        return spk_map

    # -- processing --------------------------------------------------------
    def process(self) -> None:
        self.load_meta_data()
        self.phone_encoder = self.build_phone_encoder()
        self.spk_map = self.build_spk_map()
        os.makedirs(self.hparams["binary_data_dir"], exist_ok=True)
        for prefix in ("valid", "test", "train"):
            self.process_data(prefix)

    def process_data(self, prefix: str) -> None:
        from fastdiff_tpu.data.indexed_dataset import IndexedDatasetBuilder
        out_dir = self.hparams["binary_data_dir"]
        builder = IndexedDatasetBuilder(os.path.join(out_dir, prefix))
        lengths, total_sec = [], 0.0
        for item_name, wav_fn in self.meta_data(prefix):
            item = self.process_tts_item(item_name, wav_fn)
            if item is None:
                continue
            builder.add_item(item)
            lengths.append(item["len"])
            total_sec += item["sec"]
        builder.finalize()
        np.save(os.path.join(out_dir, f"{prefix}_lengths.npy"), lengths)
        print(f"| {prefix}: {len(lengths)} items, {total_sec:.1f}s")

    def process_tts_item(self, item_name: str, wav_fn: str):
        hp = self.hparams
        args = self.binarization_args
        meta = self.item_meta[item_name]
        item = self.process_item(item_name, wav_fn, args, hparams=hp)
        if item is None:
            return None
        cfg = self.audio_config(hp)
        n_frames = item["len"]

        ph = str(meta.get("ph", "")).strip()
        if ph:
            item["ph"] = ph
            item["phone"] = np.asarray(self.phone_encoder.encode(ph), np.int64)
        item["txt"] = meta.get("txt", "")
        item["spk_id"] = self.spk_map.get(str(meta.get("spk", "SPK0")), 0)

        if args.get("with_align") and meta.get("tg_fn"):
            with open(meta["tg_fn"]) as f:
                tg_text = f.read()
            mel2ph, dur = align_textgrid(tg_text, ph.split(), n_frames,
                                         cfg.sample_rate, cfg.hop_size)
            item["mel2ph"] = mel2ph
            item["dur"] = dur
        if args.get("with_f0"):
            from fastdiff_tpu.ops.pitch import get_pitch
            wav = np.asarray(item["wav"], np.float32)
            f0, coarse = get_pitch(wav, n_frames, cfg)
            item["f0"] = f0
            item["pitch"] = coarse
            if args.get("with_f0cwt"):
                # multi-resolution prosody decomposition (ops/cwt.py; the
                # reference's with_f0cwt flag, base_binarizer.py)
                from fastdiff_tpu.ops.cwt import f0_to_cwt
                spec, mean, std = f0_to_cwt(f0)
                item["cwt_spec"] = spec
                item["cwt_mean"] = mean
                item["cwt_std"] = std
        if args.get("with_spk_embed"):
            # native d-vector extractor (models/spk_encoder.py) replaces the
            # reference's resemblyzer dependency (base_binarizer.py:156-168)
            from fastdiff_tpu.models.spk_encoder import get_speaker_encoder
            encoder = get_speaker_encoder(str(hp.get("spk_embed_ckpt", "")))
            item["spk_embed"] = encoder.embed(item["mel"])
        return item
