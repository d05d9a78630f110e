"""Repetition panel (`functions/repetition.py`): sorted-array fold
semantics pinned against hand-computed fractions, plus edge shapes
(empty doc, sub-n doc, fully repeated doc)."""

from __future__ import annotations

import math

from fuzzycat_spark.functions.repetition import repetition_cols, repetition_keep


def _panel(spark, text):
    df = spark.createDataFrame([("x", text)], "id string, text string")
    cols = repetition_cols("text")
    row = df.select(
        *[v.alias(k) for k, v in cols.items()],
        repetition_keep(cols=cols).alias("keep"),
    ).collect()[0]
    return row


def test_top_2gram_hand_computed(spark):
    # "a b a b c": 2-grams = [a b, b a, a b, b c] -> occurrence chars
    # 3+3+3+3 = 12, top gram "a b" has 2*3 = 6 -> 0.5
    row = _panel(spark, "a b a b c")
    assert math.isclose(row.top_2gram_char_frac, 6 / 12)


def test_dup_5gram_hand_computed(spark):
    # 12 tokens = "r s t u v r s t u v x y": 5-grams start at 0..7, the
    # only repeat is "r s t u v" (starts 0 and 5) -> dup chars = 9,
    # total = 8 grams x 9 chars = 72 -> 0.125
    row = _panel(spark, "r s t u v r s t u v x y")
    assert math.isclose(row.dup_5gram_char_frac, 9 / 72)


def test_empty_and_short_docs(spark):
    empty = _panel(spark, "")
    assert empty.top_2gram_char_frac == 0.0
    assert empty.dup_5gram_char_frac == 0.0
    assert empty.keep is True
    # below-n docs fall back to one whole-run shingle -> top frac 1.0
    # (same short-doc semantics as word_shingles_ordered), failing keep
    short = _panel(spark, "tiny")
    assert short.top_2gram_char_frac == 1.0
    assert short.dup_5gram_char_frac == 0.0
    assert short.keep is False


def test_fully_repeated_doc_fails_keep(spark):
    row = _panel(spark, " ".join(["spam ham"] * 30))
    # "spam ham" / "ham spam" split the 2-gram mass ~in half; the dup
    # 5-gram mass is total minus the 4 distinct first occurrences
    assert row.top_2gram_char_frac > 0.4
    assert row.dup_5gram_char_frac > 0.9
    assert row.keep is False


def test_no_repetition_keeps(spark):
    row = _panel(spark, "one two three four five six seven eight nine ten")
    assert row.dup_5gram_char_frac == 0.0
    assert row.keep is True
