"""Published web-text filter suites: Gopher quality rules and the C4
line cleaner, as pure Catalyst per-document expressions.

The reference pipeline curates metadata records, so it never needed
page-quality heuristics; a web-text corpus does, and the field
standardized on two named suites. This module implements both with
documented, deterministic subsets — every signal is a per-row fold over
the text, ZERO shuffles, no UDF, and every arithmetic step has an exact
DuckDB mirror:

- `gopher_rule_cols` — the non-repetition half of Gopher/MassiveText
  appendix A1 (Rae et al. 2021). The repetition half (duplicate-line /
  top-n-gram character fractions) already lives in
  `functions/repetition.py`; compose the two for the full suite.
- `c4_clean_cols` — C4's line-level cleanup (Raffel et al. 2020 §2.2):
  keep lines that end in terminal punctuation, carry >= 5 words, and do
  not mention javascript; then judge the page (lorem ipsum, curly
  brace, >= 3 sentences). The bad-word list stays a pluggable parameter
  (same policy as the dedup denylist — the shipped default is the
  mechanism, not 3k lines of curated data).

"Words" here are RAW whitespace tokens of the trimmed text — quality
rules measure the text as written; the slugified `tokens_col` the dedup
tiers share would erase the punctuation these rules look for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["gopher_rule_cols", "gopher_rules", "c4_clean_cols", "c4_clean"]

# Gopher's required-stopword set (A1): a document of real English prose
# contains at least two of these.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_BULLET_RE = r"^[•\-\*]"
_ELLIPSIS_END_RE = r"(\.\.\.|…)$"
_TERMINAL_RE = r'[.!?"]$'


def _words(c: Column) -> Column:
    """Raw whitespace words; empty text -> empty array (not [''])."""
    t = F.trim(c)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def _lines(c: Column) -> Column:
    """Non-empty trimmed lines."""
    return F.filter(
        F.transform(F.split(c, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )


def _occurrences(c: Column, needle: str) -> Column:
    """Non-overlapping occurrence count of a literal, via length delta —
    replace() has identical greedy-left semantics on both engines."""
    return (
        F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def gopher_rule_cols(col: Column | str) -> dict[str, Column]:
    """The Gopher A1 non-repetition signals and per-rule verdicts.
    Thresholds are the paper's: 50-100k words, mean word length 3-10,
    symbol-to-word ratio (#, ellipses) <= 0.1, <= 90% bulleted lines,
    <= 30% ellipsis-ended lines, >= 80% words with an (ASCII) alphabetic
    character, >= 2 distinct required stopwords. All-double arithmetic,
    IEEE-identical across engines; round before hash comparisons."""
    c = F.col(col) if isinstance(col, str) else col
    words = _words(c)
    n_words = F.size(words).cast("long")
    safe_w = F.greatest(n_words, F.lit(1)).cast("double")
    mean_word_len = (
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).cast("double")
        / safe_w
    )
    symbol_ratio = (
        _occurrences(c, "#") + _occurrences(c, "…") + _occurrences(c, "...")
    ) / safe_w
    lines = _lines(c)
    n_lines = F.size(lines).cast("long")
    safe_l = F.greatest(n_lines, F.lit(1)).cast("double")
    bullet_frac = (
        F.size(F.filter(lines, lambda ln: ln.rlike(_BULLET_RE))).cast("double")
        / safe_l
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda ln: ln.rlike(_ELLIPSIS_END_RE))).cast(
            "double"
        )
        / safe_l
    )
    alpha_word_frac = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("double")
        / safe_w
    )
    stop_hits = F.size(
        F.array_intersect(
            F.transform(words, F.lower),
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        )
    ).cast("long")
    out: dict[str, Column] = {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_ratio": symbol_ratio,
        "bullet_frac": bullet_frac,
        "ellipsis_frac": ellipsis_frac,
        "alpha_word_frac": alpha_word_frac,
        "stop_hits": stop_hits,
        "ok_word_count": (n_words >= 50) & (n_words <= 100_000),
        "ok_mean_word_len": (mean_word_len >= 3.0) & (mean_word_len <= 10.0),
        "ok_symbol_ratio": symbol_ratio <= 0.1,
        "ok_bullet": bullet_frac <= 0.9,
        "ok_ellipsis": ellipsis_frac <= 0.3,
        "ok_alpha_words": alpha_word_frac >= 0.8,
        "ok_stop_words": stop_hits >= 2,
    }
    out["keep"] = (
        out["ok_word_count"]
        & out["ok_mean_word_len"]
        & out["ok_symbol_ratio"]
        & out["ok_bullet"]
        & out["ok_ellipsis"]
        & out["ok_alpha_words"]
        & out["ok_stop_words"]
    )
    return out


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, signals..., per-rule oks..., keep) per document."""
    cols = gopher_rule_cols(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[v.alias(k) for k, v in cols.items()],
    )


def c4_clean_cols(col: Column | str) -> dict[str, Column]:
    """C4 §2.2 line cleanup + page verdict. A line survives when it ends
    in terminal punctuation (. ! ? \"), carries >= 5 whitespace words,
    and does not contain 'javascript' (any case). The page survives when
    it has no 'lorem ipsum', no '{', and >= 3 sentences (terminal-punct
    occurrences in the CLEANED text) across >= 1 kept line."""
    c = F.col(col) if isinstance(col, str) else col
    lines = _lines(c)
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(_TERMINAL_RE)
        & (F.size(F.split(ln, r"\s+")) >= 5)
        & ~F.lower(ln).contains("javascript"),
    )
    text_clean = F.array_join(kept, "\n")
    n_kept = F.size(kept).cast("long")
    n_dropped = (F.size(lines) - F.size(kept)).cast("long")
    n_sentences = (
        F.length(text_clean)
        - F.length(F.regexp_replace(text_clean, r"[.!?]", ""))
    ).cast("long")
    has_lorem = F.lower(c).contains("lorem ipsum")
    has_brace = c.contains("{")
    return {
        "text_clean": text_clean,
        "n_lines_kept": n_kept,
        "n_lines_dropped": n_dropped,
        "n_sentences": n_sentences,
        "has_lorem_ipsum": has_lorem,
        "has_curly_brace": has_brace,
        "keep": ~has_lorem
        & ~has_brace
        & (n_sentences >= 3)
        & (n_kept >= 1),
    }


def c4_clean(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, text_clean, line/sentence counters, page flags, keep)."""
    cols = c4_clean_cols(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[v.alias(k) for k, v in cols.items()],
    )
