"""Sonority-sequencing syllabifier + en_syl processor.

Reference behavior: data_gen/tts/txt_processors/en_syl.py — per word,
SonoriPy syllables contribute their letters (no syllable marker), words
separated by '|'; nucleus-free inputs fall back to character tokens.
"""

import pytest

from fastdiff_tpu.text.processors import get_txt_processor_cls
from fastdiff_tpu.text.syllabify import syllabify


class TestSyllabify:
    def test_concatenation_invariant(self):
        # syllables always reassemble to the word (SonoriPy contract)
        for w in ["syllable", "understanding", "window", "banana", "extra",
                  "strength", "rhythm", "butter", "algorithm", "make"]:
            assert "".join(syllabify(w)) == w

    def test_counts(self):
        # nucleus counting on unambiguous cases
        assert len(syllabify("banana")) == 3
        assert len(syllabify("window")) == 2
        assert len(syllabify("strength")) == 1
        assert len(syllabify("a")) == 1

    def test_silent_e(self):
        # final silent 'e' does not create a syllable
        assert syllabify("make") == ["make"]
        assert syllabify("stone") == ["stone"]

    def test_sonority_minimum_split(self):
        # the cluster splits at the sonority minimum: 'nd' in 'window'
        # (n=nasal > d=stop) puts 'd' in the onset of the next syllable
        assert syllabify("window") == ["win", "dow"]
        assert syllabify("butter") == ["but", "ter"]

    def test_vocalic_y(self):
        # 'y' is a nucleus only away from vowel letters
        assert len(syllabify("rhythm")) == 1
        assert len(syllabify("yes")) == 1

    def test_no_nucleus(self):
        assert syllabify("123") == []
        assert syllabify("") == []

    def test_preserves_case(self):
        assert "".join(syllabify("Window")) == "Window"


class TestEnSylProcessor:
    def test_word_separators_and_letters(self):
        p = get_txt_processor_cls("en_syl")
        phones, txt = p.process("hello world")
        assert phones == list("hello") + ["|"] + list("world")
        assert txt == "hello world"

    def test_normalization_applies(self):
        p = get_txt_processor_cls("en_syl")
        phones, txt = p.process("42 cats")
        assert txt == "forty two cats"
        assert "|" in phones

    def test_no_edge_separators(self):
        p = get_txt_processor_cls("en_syl")
        phones, _ = p.process("  hi  ")
        assert phones[0] != "|" and phones[-1] != "|"
