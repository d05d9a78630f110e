"""Gopher A1 (non-repetition) rules + C4 line cleaner
(`functions/webfilters.py`): hand-pinned arithmetic per rule."""

from __future__ import annotations

from fuzzycat_spark.functions.webfilters import c4_clean, gopher_rules


def _one(spark, text: str):
    return spark.createDataFrame([("d", text)], "doc_id string, text string")


def _g(spark, text: str):
    return gopher_rules(_one(spark, text)).collect()[0]


def _c(spark, text: str):
    return c4_clean(_one(spark, text)).collect()[0]


PROSE_50 = " ".join(
    ["the quick brown fox jumps over that lazy dog again and again with be of"]
    * 4
)  # 60 words, all rules pass


def test_good_prose_passes_all(spark):
    r = _g(spark, PROSE_50)
    assert r.keep is True


def test_word_count_bounds(spark):
    assert _g(spark, "too few words here").ok_word_count is False
    assert _g(spark, PROSE_50).ok_word_count is True


def test_mean_word_length(spark):
    r = _g(spark, "aa bb cc dd")
    assert r.mean_word_len == 2.0 and r.ok_mean_word_len is False
    long = " ".join(["extraordinarily"] * 10)  # 15 chars
    assert _g(spark, long).ok_mean_word_len is False


def test_symbol_ratio_counts_hash_and_both_ellipses(spark):
    # 10 words, one '#', one '…', one '...' -> 3/10 = 0.3
    r = _g(spark, "a# b c… d e... f g h i j")
    assert abs(r.symbol_ratio - 0.3) < 1e-12
    assert r.ok_symbol_ratio is False


def test_bullet_and_ellipsis_line_fractions(spark):
    text = "- one bullet line\nplain line\n- another bullet"
    r = _g(spark, text)
    assert abs(r.bullet_frac - 2 / 3) < 1e-12 and r.ok_bullet is True
    text2 = "teaser goes on...\nplain line."
    r2 = _g(spark, text2)
    assert abs(r2.ellipsis_frac - 0.5) < 1e-12 and r2.ok_ellipsis is False


def test_alpha_word_fraction(spark):
    r = _g(spark, "111 222 abc 44 e5")
    # 'abc' and 'e5' contain letters -> 2/5
    assert abs(r.alpha_word_frac - 0.4) < 1e-12 and r.ok_alpha_words is False


def test_stop_hits_distinct_and_case_folded(spark):
    r = _g(spark, "The the THE zork")  # only 'the' -> 1 distinct
    assert r.stop_hits == 1 and r.ok_stop_words is False
    r2 = _g(spark, "The words that matter")
    assert r2.stop_hits == 2 and r2.ok_stop_words is True


def test_empty_text_all_zero_no_nulls(spark):
    r = _g(spark, "")
    assert r.n_words == 0 and r.mean_word_len == 0.0 and r.keep is False
    c = _c(spark, "")
    assert (c.text_clean, c.n_lines_kept, c.keep) == ("", 0, False)


def test_c4_line_retention_rules(spark):
    text = "\n".join(
        [
            "This sentence has the five words needed.",  # kept
            "Short line.",  # < 5 words
            "no terminal punctuation on this line at all",  # unterminated
            "Please enable JavaScript to see the widget.",  # javascript
            'He said the quoted line counts as "terminal."',  # quote end kept
        ]
    )
    r = _c(spark, text)
    assert r.n_lines_kept == 2 and r.n_lines_dropped == 3
    assert "JavaScript" not in r.text_clean
    assert r.text_clean.splitlines()[0].startswith("This sentence")


def test_c4_page_verdicts(spark):
    lorem = "Lorem Ipsum dolor sit amet is placeholder text for sure.\n" * 3
    assert _c(spark, lorem).keep is False
    brace = "The code { leaked } into the page body text here.\n" * 3
    assert _c(spark, brace).keep is False
    two = "One full sentence with enough words here.\nAnd a second sentence with enough words too."
    r = _c(spark, two)
    assert r.n_sentences == 2 and r.keep is False


def test_c4_keeps_line_order(spark):
    text = "Zed comes first in this cleaned page order.\nAlpha comes second in this cleaned page order."
    r = _c(spark, text)
    assert r.text_clean.splitlines() == [
        "Zed comes first in this cleaned page order.",
        "Alpha comes second in this cleaned page order.",
    ]
