"""Chinese text front-end: NSW normalization + pinyin G2P properties."""

import numpy as np
import pytest

from fastdiff_tpu.text.zh_g2p import CHAR_PINYIN, zh_g2p
from fastdiff_tpu.text.zh_norm import (digits_to_hanzi, normalize_zh,
                                       num_to_hanzi, number_to_hanzi)


# -- cardinal numbers ---------------------------------------------------------

@pytest.mark.parametrize("n,want", [
    (0, "零"), (5, "五"), (10, "十"), (15, "十五"), (20, "二十"),
    (103, "一百零三"), (110, "一百一十"), (115, "一百一十五"),
    (1030, "一千零三十"), (1005, "一千零五"), (10000, "一万"),
    (10001, "一万零一"), (120000, "十二万"), (100000000, "一亿"),
    (100010000, "一亿零一万"), (200500030, "二亿零五十万零三十"),
])
def test_cardinals(n, want):
    assert num_to_hanzi(n) == want


def test_decimals_and_negatives():
    assert number_to_hanzi("0.5") == "零点五"
    assert number_to_hanzi("12.34") == "十二点三四"
    assert number_to_hanzi("-3") == "负三"
    assert number_to_hanzi("-0.25") == "负零点二五"


def test_roundtrippable_random_numbers():
    rng = np.random.default_rng(0)
    for _ in range(200):
        n = int(rng.integers(0, 10 ** 12))
        h = num_to_hanzi(n)
        assert "零零" not in h
        assert not h.endswith("零") or n == 0
        assert h[0] != "零" or n == 0


# -- NSW patterns -------------------------------------------------------------

def test_dates():
    assert normalize_zh("2021年3月15日") == "二〇二一年三月十五日"
    assert normalize_zh("2021-03-15") == "二〇二一年三月十五日"
    assert normalize_zh("2021/3/5") == "二〇二一年三月五日"


def test_times():
    assert normalize_zh("8:30") == "八点三十分"
    assert normalize_zh("8:05") == "八点零五分"
    assert normalize_zh("12:00") == "十二点整"


def test_percent_fraction_range():
    assert normalize_zh("10.5%") == "百分之十点五"
    assert normalize_zh("3‰") == "千分之三"
    assert normalize_zh("1/3") == "三分之一"
    assert normalize_zh("3~5") == "三到五"


def test_money_and_units():
    assert normalize_zh("¥12.50") == "十二点五元"
    assert normalize_zh("气温-3℃") == "气温负三摄氏度"


def test_phone_numbers_digitwise():
    assert normalize_zh("13812345678") == "幺三八幺二三四五六七八"
    assert "幺" in normalize_zh("010-12345678")


def test_fullwidth_and_plain_numbers():
    assert normalize_zh("１２３") == "一百二十三"
    assert normalize_zh("共123个") == "共一百二十三个"


# -- G2P ----------------------------------------------------------------------

def test_g2p_basic():
    assert zh_g2p("中国") == ["zhong1", "guo2"]
    assert zh_g2p("你好") == ["ni3", "hao3"]


def test_g2p_polyphones():
    assert zh_g2p("银行") == ["yin2", "hang2"]
    assert zh_g2p("行走") == ["xing2", "zou3"]
    assert zh_g2p("音乐") == ["yin1", "yue4"]
    assert zh_g2p("快乐") == ["kuai4", "le4"]


def test_g2p_tone_sandhi():
    assert zh_g2p("不是") == ["bu2", "shi4"]       # bu4 -> bu2 before tone 4
    assert zh_g2p("不好") == ["bu4", "hao3"]
    assert zh_g2p("一个") == ["yi2", "ge4"]        # yi -> yi2 before tone 4
    assert zh_g2p("一天") == ["yi4", "tian1"]      # yi -> yi4 before tone 1


def test_g2p_covers_all_normalizer_output():
    """Every hanzi the normalizer can emit must be in the lexicon."""
    probes = ["13812345678", "2021年3月15日", "10.5%", "¥12.50", "1/3",
              "8:30", "-3℃", "987654321098", "3~5"]
    for p in probes:
        for ch in normalize_zh(p):
            if "一" <= ch <= "鿿" or ch == "〇":
                assert ch in CHAR_PINYIN, f"{ch!r} missing from lexicon"


def test_processor_end_to_end():
    from fastdiff_tpu.text.processors import get_txt_processor_cls
    phones, norm = get_txt_processor_cls("zh").process("今天8:30，气温-3℃。")
    assert "UNK" not in phones
    assert "|" in phones          # char boundary within a word (zh.py:61-82)
    assert "#" in phones          # segmentation-word boundary
    assert "," in phones          # punctuation survives as its own token
    assert phones[0] == "jin1"
    # boundary markers never sit next to silence tokens (zh.py:84-89)
    sil = set("!,.?;:") | {"|", "#"}
    for a, b in zip(phones, phones[1:]):
        assert not (a in ("#", "|") and b in sil), (a, b)
        assert not (b in ("#", "|") and a in sil and a not in ("#", "|")), (a, b)
    # zh_g2pM alias resolves to the same processor
    assert get_txt_processor_cls("zh_g2pM") is get_txt_processor_cls("zh")


def test_song_seg_processor():
    """SEP markers survive as phones; boundary markers are stripped
    (reference: txt_processors/zh_song_seg.py, zh_g2pM_song_seg.py)."""
    from fastdiff_tpu.text.processors import get_txt_processor_cls
    cls = get_txt_processor_cls("zh_song_seg")
    phones, norm = cls.process("今天SEP气温低")
    assert "SEP" in phones
    assert "|" not in phones and "#" not in phones
    assert phones[0] == "jin1"
    assert " SEP " in norm
    assert get_txt_processor_cls("zh_g2pM_song_seg") is cls
    assert cls.sp_phonemes() == ["|", "#", "&"]
