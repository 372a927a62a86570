"""Text pipeline (encoder, normalization, processors) and audio metrics."""

import numpy as np
import pytest

from fastdiff_tpu.config import AudioConfig
from fastdiff_tpu.text.encoder import EOS, PAD, UNK, TokenTextEncoder
from fastdiff_tpu.text.normalize import normalize_text, number_to_words
from fastdiff_tpu.text.processors import get_txt_processor_cls
from fastdiff_tpu.utils import metrics


# -- encoder ---------------------------------------------------------------

def test_encoder_reserved_ids():
    enc = TokenTextEncoder(vocab_list=["a", "b", "|"])
    assert enc.pad() == 0 and enc.eos() == 1 and enc.unk() == 2
    assert enc.encode("a b") == [3, 4]
    assert enc.decode(enc.encode("a b")) == "a b"
    assert enc.vocab_size == 6


def test_encoder_oov_and_strip():
    enc = TokenTextEncoder(vocab_list=["a", "b"], replace_oov=UNK)
    assert enc.encode("a zz b") == [3, 2, 4]
    ids = [3, 4, enc.eos(), enc.pad(), enc.pad()]
    assert enc.decode(ids, strip_eos=True, strip_padding=True) == "a b"


def test_encoder_file_roundtrip(tmp_path):
    enc = TokenTextEncoder(vocab_list=["x", "y", "."])
    path = str(tmp_path / "vocab.txt")
    enc.store_to_file(path)
    enc2 = TokenTextEncoder(vocab_filename=path)
    assert enc2.encode("x y") == enc.encode("x y")
    assert "." in enc2.sil_phonemes()


# -- normalization ---------------------------------------------------------

@pytest.mark.parametrize("n,words", [
    (0, "zero"), (7, "seven"), (15, "fifteen"), (42, "forty two"),
    (100, "one hundred"), (215, "two hundred fifteen"),
    (1000, "one thousand"), (1000000, "one million"),
])
def test_number_to_words(n, words):
    assert number_to_words(n) == words


def test_normalize_text():
    assert normalize_text("Dr. Smith paid $5.") == "doctor smith paid five dollars."
    assert normalize_text("In 1984, 2nd place!") == \
        "in nineteen eighty four, second place!"
    assert normalize_text("Hello   WORLD—now") == "hello world now"


def test_grapheme_processor():
    cls = get_txt_processor_cls("grapheme")
    phones, txt = cls.process("Hi there")
    assert phones == ["h", "i", "|", "t", "h", "e", "r", "e"]
    assert txt == "hi there"


def test_en_processor_fallback_runs():
    cls = get_txt_processor_cls("en")
    phones, txt = cls.process("Test 12.")
    assert len(phones) > 0
    assert "|" not in (phones[0], phones[-1])


# -- metrics ---------------------------------------------------------------

def _tone(freq, seconds=0.6, sr=22050):
    t = np.arange(int(sr * seconds)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_metrics_identity_is_zero():
    wav = _tone(440)
    assert metrics.mcd(wav, wav) < 1e-6
    assert metrics.mel_spectral_distance(wav, wav) < 1e-6
    assert metrics.multi_resolution_stft_distance(wav, wav) < 1e-6


def test_metrics_order_sensible():
    """Same-pitch signals must score better than detuned ones (all signals
    carry a noise floor so the log-mel floor doesn't dominate)."""
    rng = np.random.default_rng(0)
    floor = 0.01 * rng.standard_normal(len(_tone(440))).astype(np.float32)
    base = _tone(440) + floor
    near = _tone(440) + 0.01 * rng.standard_normal(len(floor)).astype(np.float32)
    far = _tone(660) + floor
    assert metrics.mcd(base, near) < metrics.mcd(base, far)
    assert metrics.mel_spectral_distance(base, near) < \
        metrics.mel_spectral_distance(base, far)


def test_rtf():
    assert metrics.compute_rtf(1.0, 22050) == pytest.approx(1.0)
    assert metrics.compute_rtf(0.5, 44100) == pytest.approx(0.25)


def test_dtw_distance():
    a = np.asarray([0.0, 1.0, 2.0, 3.0])
    assert metrics.dtw_distance(a, a) == 0.0
    # time-warped copy still matches closely; different sequence doesn't
    warped = np.asarray([0.0, 0.0, 1.0, 1.0, 2.0, 3.0, 3.0])
    far = a + 5.0
    assert metrics.dtw_distance(a, warped) < 0.1
    assert metrics.dtw_distance(a, far) > 1.0


def test_pitch_alignment_distance():
    same = metrics.pitch_alignment_distance(_tone(220), _tone(220))
    diff = metrics.pitch_alignment_distance(_tone(220), _tone(330))
    assert same < 0.2
    assert diff > same + 3.0   # ~7 semitones apart
