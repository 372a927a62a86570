"""TTS pre-align (G2P + MFA dictionary generation) and the full zh pipeline:
text -> phones -> pre-align artifacts -> binarized -> FS2-trainable."""

import json
import os

import numpy as np

from fastdiff_tpu.data.pre_align import TTSPreAlign, is_sil_phoneme
from fastdiff_tpu.utils import audio_io

SR = 22050

ZH_TEXTS = ["今天8:30。", "你好中国。", "一个人走。", "气温-3℃。",
            "百分之10。"]


def _make_zh_raw(tmp_path, n_items=5):
    raw = tmp_path / "raw"
    raw.mkdir()
    rng = np.random.default_rng(0)
    for i in range(n_items):
        t = np.arange(int(SR * 0.6)) / SR
        wav = (0.4 * np.sin(2 * np.pi * (160 + 25 * i) * t)
               + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
        audio_io.save_wav(wav, str(raw / f"zh{i}.wav"), SR)
        with open(raw / f"zh{i}.txt", "w") as f:
            f.write(ZH_TEXTS[i % len(ZH_TEXTS)])
    return {
        "raw_data_dir": str(raw),
        "processed_data_dir": str(tmp_path / "processed"),
        "binary_data_dir": str(tmp_path / "binary"),
        "audio_sample_rate": SR, "audio_num_mel_bins": 80,
        "fft_size": 1024, "hop_size": 256, "win_size": 1024,
        "fmin": 80, "fmax": 7600, "test_num": 1,
        "pre_align_args": {"txt_processor": "zh", "allow_no_txt": False,
                           "nsample_per_group": 1000},
        "binarization_args": {"with_wav": True, "with_f0": False,
                              "with_align": False},
        "N_PROC": 1,
    }


def test_process_text_contract():
    from fastdiff_tpu.text.processors import get_txt_processor_cls
    ph, word_prons, ph_align, txt = TTSPreAlign.process_text(
        get_txt_processor_cls("grapheme"), "hello world", {})
    assert ph.startswith("<BOS>") and ph.endswith("<EOS>")
    assert "h e l l o" in " ".join(word_prons)
    assert ph_align.split()[0] == "SIL"          # <BOS> -> SIL in align text
    assert "h_e_l_l_o" in ph_align
    assert is_sil_phoneme("<BOS>") and is_sil_phoneme("|")
    assert not is_sil_phoneme("AH0")


def test_tts_pre_align_artifacts(tmp_path):
    hp = _make_zh_raw(tmp_path)
    TTSPreAlign(hp).process()
    pdir = hp["processed_data_dir"]

    phone_set = json.load(open(os.path.join(pdir, "phone_set.json")))
    assert "zhong1" in phone_set and "<BOS>" in phone_set

    mfa_dict = open(os.path.join(pdir, "mfa_dict.txt")).read()
    assert "SIL SIL" in mfa_dict
    # MFA 'words' are alignment units between boundary markers; with the
    # zh processor's reference boundary contract ('#' between jieba words,
    # '|' between in-word syllables — both word breaks, base_pre_align.py
    # :126-138) each whole-syllable phone is its own unit
    assert "zhong1 zhong1" in mfa_dict

    labs = []
    for root, _, files in os.walk(os.path.join(pdir, "mfa_inputs")):
        labs += [os.path.join(root, f) for f in files if f.endswith(".lab")]
    assert len(labs) == 5
    assert "SIL" in open(labs[0]).read()

    import csv
    rows = list(csv.DictReader(open(os.path.join(pdir, "metadata_phone.csv"))))
    assert {"item_name", "wav_fn", "txt", "txt_raw", "ph", "spk"} <= set(rows[0])
    assert rows[0]["ph"].startswith("<BOS>")


def test_zh_text_to_fs2_trainable(tmp_path):
    """The VERDICT done-criterion: a zh utterance goes text -> phones ->
    binarized -> FS2 train step in one pipeline."""
    from fastdiff_tpu.data.tts_binarizer import TTSBinarizer
    from fastdiff_tpu.training.tts_task import FastSpeech2Task

    hp = _make_zh_raw(tmp_path)
    TTSPreAlign(hp).process()
    hp["processed_data_dir"] = hp["processed_data_dir"]
    TTSBinarizer(hp).process()

    hp.update({
        "max_samples": 256, "max_sentences": 2, "max_valid_sentences": 1,
        "hidden_size": 32, "enc_layers": 1, "dec_layers": 1, "num_heads": 2,
        "ffn_hidden": 64, "enc_ffn_kernel_size": 3, "max_frames": 200,
        "use_pitch_embed": False, "lr": 1e-3, "weight_decay": 0,
        "scheduler": "none", "optimizer_adam_beta1": 0.9,
        "optimizer_adam_beta2": 0.98, "clip_grad_norm": 1,
        "accumulate_grad_batches": 1, "seed": 0, "endless_ds": True,
    })
    task = FastSpeech2Task(hp)
    state = task.build_state()
    batch = next(task.train_dataloader())
    assert batch["tokens"].max() > 2          # real phone ids, not reserved
    state, losses = task.train_step(state, batch)
    assert np.isfinite(float(losses["total"]))
