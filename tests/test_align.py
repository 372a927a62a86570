"""TextGrid parsing and phone alignment (mel2ph / durations)."""

import numpy as np
import pytest

from fastdiff_tpu.data.align import align_textgrid, is_sil_phoneme, parse_textgrid

TG = '''File type = "ooTextFile"
Object class = "TextGrid"
xmin = 0
xmax = 1.0
tiers? <exists>
size = 2
item []:
    item [1]:
        class = "IntervalTier"
        name = "words"
        xmin = 0
        xmax = 1.0
        intervals: size = 1
        intervals [1]:
            xmin = 0
            xmax = 1.0
            text = "hi"
    item [2]:
        class = "IntervalTier"
        name = "phones"
        xmin = 0
        xmax = 1.0
        intervals: size = 4
        intervals [1]:
            xmin = 0.0
            xmax = 0.1
            text = "sil"
        intervals [2]:
            xmin = 0.1
            xmax = 0.4
            text = "HH"
        intervals [3]:
            xmin = 0.4
            xmax = 0.8
            text = "AY"
        intervals [4]:
            xmin = 0.8
            xmax = 1.0
            text = ""
'''


def test_parse_textgrid():
    tiers = parse_textgrid(TG)
    assert len(tiers) == 2
    phones = tiers[-1]
    assert len(phones) == 4
    assert phones[1] == (0.1, 0.4, "HH")


def test_is_sil_phoneme():
    assert is_sil_phoneme("|") and is_sil_phoneme(".") and is_sil_phoneme("")
    assert not is_sil_phoneme("HH")


def test_align_textgrid():
    # 1.0 s at sr 22050, hop 256 -> 86 frames
    sr, hop, n_frames = 22050, 256, 86
    phones = ["<SIL>", "HH", "AY", "<SIL>"]
    mel2ph, dur = align_textgrid(TG, phones, n_frames, sr, hop)
    assert mel2ph.shape == (n_frames,)
    assert dur.sum() == n_frames
    # phone 2 (HH) spans 0.1-0.4s -> frames ~9..34
    assert mel2ph[10] == 2 and mel2ph[30] == 2
    assert mel2ph[40] == 3            # AY
    assert mel2ph[0] == 1             # leading sil
    assert mel2ph[-1] == 4            # trailing sil
    np.testing.assert_array_equal(np.bincount(mel2ph)[1:], dur)


def test_align_mismatch_raises():
    with pytest.raises(ValueError):
        align_textgrid(TG, ["<SIL>", "HH", "AY", "K", "<SIL>"], 86, 22050, 256)
