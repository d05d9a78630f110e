"""Property-based tests (Hypothesis) for the scalar normalization /
phonetic kernels — the functions every blocking key flows through. No
Spark session needed: these check the pure-Python reference
implementations that the Arrow UDFs mirror.

`derandomize=True` keeps runs reproducible (no CI-only flakes); raise
examples locally with HYPOTHESIS_PROFILE if hunting."""

from __future__ import annotations

import unicodedata

from hypothesis import given, settings, strategies as st

from fuzzycat_spark.functions.normalize import (
    sandcrawler_slugify,
    unicode_slugify,
)
from fuzzycat_spark.functions.phonetic import nysiis

text = st.text(max_size=200)
SETTINGS = settings(derandomize=True, max_examples=300, deadline=None)


@given(text)
@SETTINGS
def test_sandcrawler_slugify_output_alphabet(s):
    out = sandcrawler_slugify(s)
    assert out is not None
    assert out == out.lower()
    # the strip classes are gone: no whitespace, punctuation, or marks.
    # Non-whitespace control chars (e.g. ESC) survive — the reference's
    # regex (sandcrawler.py:63) strips only \s/\p{P}/\p{M}+extras, and
    # parity wins over cosmetics here.
    for ch in out:
        cat = unicodedata.category(ch)
        assert not ch.isspace()
        assert cat[0] not in ("P", "M", "Z"), (s, out, ch, cat)


def test_sandcrawler_slugify_none_passthrough():
    assert sandcrawler_slugify(None) is None
    assert unicode_slugify(None) is None
    assert nysiis(None) is None


@given(text)
@SETTINGS
def test_unicode_slugify_idempotent_and_collapsed(s):
    once = unicode_slugify(s)
    assert once == once.lower()
    assert "  " not in once and not once.startswith(" ") and not once.endswith(" ")
    assert unicode_slugify(once) == once


@given(text)
@SETTINGS
def test_nysiis_shape(s):
    out = nysiis(s)
    # alphabetic uppercase, empty iff input has no alphabetic characters
    assert out == "" or out.isalpha()
    assert out == out.upper()
    has_alpha = any(ch.isalpha() for ch in s)
    assert (out != "") == has_alpha


@given(text)
@SETTINGS
def test_nysiis_case_insensitive(s):
    assert nysiis(s) == nysiis(s.lower()) == nysiis(s.upper())
