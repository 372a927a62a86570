"""TTS binarizer: phone encoding, spk map, f0, records."""

import json
import os

import numpy as np

from fastdiff_tpu.data.indexed_dataset import IndexedDataset
from fastdiff_tpu.data.tts_binarizer import TTSBinarizer
from fastdiff_tpu.utils import audio_io


def _make_tts_dataset(tmp_path, n_items=4, sr=22050):
    raw = tmp_path / "raw"
    raw.mkdir()
    rows = []
    rng = np.random.default_rng(0)
    phone_pool = ["HH AY | W ER L D", "G UH D | D EY .", "T EH S T",
                  "W AH N .", "T UW | M AO R", "TH R IY ."]
    phones = [phone_pool[i % len(phone_pool)] for i in range(n_items)]
    for i in range(n_items):
        t = np.arange(sr // 2) / sr
        wav = (0.4 * np.sin(2 * np.pi * (180 + 30 * i) * t)
               + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        fn = str(raw / f"it{i}.wav")
        audio_io.save_wav(wav, fn, sr)
        rows.append({"item_name": f"it{i}", "wav_fn": fn,
                     "txt": f"text {i}", "ph": phones[i],
                     "spk": f"SPK{i % 2}"})
    import csv
    with open(tmp_path / "metadata_phone.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    return {
        "processed_data_dir": str(tmp_path),
        "binary_data_dir": str(tmp_path / "binary"),
        "audio_sample_rate": sr, "audio_num_mel_bins": 80,
        "fft_size": 1024, "hop_size": 256, "win_size": 1024,
        "fmin": 80, "fmax": 7600, "test_num": 1,
        "binarization_args": {"with_wav": True, "with_f0": True,
                              "with_align": False},
        "N_PROC": 1,
    }


def test_tts_binarize(tmp_path):
    hp = _make_tts_dataset(tmp_path)
    TTSBinarizer(hp).process()
    bdir = hp["binary_data_dir"]

    phone_set = json.load(open(os.path.join(bdir, "phone_set.json")))
    assert "HH" in phone_set and "|" in phone_set
    spk_map = json.load(open(os.path.join(bdir, "spk_map.json")))
    assert spk_map == {"SPK0": 0, "SPK1": 1}

    ds = IndexedDataset(os.path.join(bdir, "train"))
    assert len(ds) == 3
    item = ds[0]
    assert item["mel"].shape[1] == 80
    assert "phone" in item and item["phone"].dtype == np.int64
    assert "f0" in item and len(item["f0"]) == item["len"]
    assert "pitch" in item and item["pitch"].max() < 256
    assert item["spk_id"] in (0, 1)
