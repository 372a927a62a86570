"""Zh path end-to-end: text -> phones+words -> binarized (char-level
durs/f0) -> FS2-trainable (reference: data_gen/tts/binarizer_zh.py)."""

import csv
import json
import os

import numpy as np
import pytest

from fastdiff_tpu.data.indexed_dataset import IndexedDataset
from fastdiff_tpu.data.zh_binarizer import (ZhBinarizer, char_level_f0,
                                            group_phones_to_words)
from fastdiff_tpu.utils import audio_io

ZH_TEXTS = ["今天天气好", "气温负三度", "你好世界", "明天见", "谢谢大家"]


def _make_zh_dataset(tmp_path, sr=22050):
    from fastdiff_tpu.text.processors import get_txt_processor_cls
    proc = get_txt_processor_cls("zh")
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    rows = []
    for i, txt in enumerate(ZH_TEXTS):
        phones, norm = proc.process(txt)
        ph = " ".join(["<BOS>"] + phones + ["<EOS>"])
        t = np.arange(sr // 2) / sr
        wav = (0.4 * np.sin(2 * np.pi * (160 + 25 * i) * t)
               + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        fn = str(raw / f"zh{i}.wav")
        audio_io.save_wav(wav, fn, sr)
        rows.append({"item_name": f"zh{i}", "wav_fn": fn,
                     "txt": norm, "ph": ph, "spk": "SPK0"})
    with open(tmp_path / "metadata_phone.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    return {
        "processed_data_dir": str(tmp_path),
        "binary_data_dir": str(tmp_path / "binary"),
        "audio_sample_rate": sr, "audio_num_mel_bins": 80,
        "fft_size": 1024, "hop_size": 256, "win_size": 1024,
        "fmin": 80, "fmax": 7600, "test_num": 1, "word_size": 100,
        "binarization_args": {"with_wav": True, "with_f0": True,
                              "with_align": False},
        "N_PROC": 1,
    }


def test_group_phones_to_words():
    # '今天 八点' style: BOS + syl | syl # syl | syl + punct + EOS
    ph = "<BOS> jin1 | tian1 # ba1 | dian3 , qi4 <EOS>".split()
    ph_words, ph2word = group_phones_to_words(ph)
    # groups: <BOS>, jin1_|, tian1_#, ba1_|, dian3, ',', qi4, <EOS>
    assert ph_words[0] == "<BOS>" and ph_words[-1] == "<EOS>"
    assert "," in ph_words
    assert len(ph_words) == 8
    assert ph2word[0] == 1 and ph2word[-1] == len(ph_words)
    assert (np.diff(ph2word) >= 0).all()


def test_char_level_f0():
    ph = "<BOS> jin1 | tian1 <EOS>".split()
    # groups: BOS(1), jin1_|(2), tian1(3), EOS(4)
    mel2ph = np.asarray([1, 2, 2, 2, 4, 4, 5, 0])
    f0 = np.asarray([0, 100, 110, 0, 200, 220, 0, 0], np.float32)
    out = char_level_f0(f0, mel2ph, ph)
    np.testing.assert_allclose(out[1:4], 105.0)   # mean of voiced 100,110
    np.testing.assert_allclose(out[4:6], 210.0)
    assert out[0] == 0.0 and out[6] == 0.0        # BOS/EOS spans: not pinyin


@pytest.fixture(scope="module")
def zh_data(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("zh_bin")
    hp = _make_zh_dataset(tmp_path)
    ZhBinarizer(hp).process()
    return hp


def test_zh_binarize_words(zh_data):
    bdir = zh_data["binary_data_dir"]
    word_set = json.load(open(os.path.join(bdir, "word_set.json")))
    assert "天" in word_set                        # frequent corpus char
    ds = IndexedDataset(os.path.join(bdir, "train"))
    item = ds[0]
    # phone-side word views
    assert len(item["ph_words"]) == len(item["dur_word"])
    assert len(item["ph2word"]) == len(item["ph"].split())
    assert max(item["ph2word"]) == len(item["ph_words"])
    # words = <BOS> + chars + <EOS>, 1:1 with phone groups
    assert item["words"][0] == "<BOS>" and item["words"][-1] == "<EOS>"
    assert len(item["words"]) == len(item["ph_words"]), \
        (item["words"], item["ph_words"])
    assert len(item["word_tokens"]) == len(item["words"])
    # frame-side word views
    assert len(item["mel2word"]) == item["len"]
    assert sum(item["dur_word"]) == sum(1 for w in item["mel2word"] if w > 0)
    # char-level f0 aggregation: piecewise-constant per char span
    assert "f0_ph" in item and len(item["f0_ph"]) == item["len"]


def test_zh_fs2_trainable(zh_data):
    """Binarized zh data drives an FS2 training step (dur/pitch from the
    uniform-alignment fallback + frame pitch)."""
    hp = dict(zh_data)
    hp.update({
        "max_samples": 256, "max_sentences": 2, "max_valid_sentences": 1,
        "hidden_size": 32, "enc_layers": 1, "dec_layers": 1, "num_heads": 2,
        "ffn_hidden": 64, "enc_ffn_kernel_size": 3, "max_frames": 200,
        "use_pitch_embed": True, "lr": 1e-3, "weight_decay": 0,
        "scheduler": "none", "optimizer_adam_beta1": 0.9,
        "optimizer_adam_beta2": 0.98, "clip_grad_norm": 1,
        "accumulate_grad_batches": 1, "seed": 0, "endless_ds": True,
    })
    from fastdiff_tpu.training.tts_task import FastSpeech2Task
    task = FastSpeech2Task(hp)
    state = task.build_state()
    batch = next(task.train_dataloader())
    state, losses = task.train_step(state, batch)
    assert np.isfinite(float(losses["total"]))
    assert float(losses["f0"]) >= 0 and float(losses["uv"]) >= 0
