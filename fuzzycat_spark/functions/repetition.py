"""Repetition-based quality signals for training-data curation.

The MassiveText/Gopher data pipeline (Rae et al. 2021, appendix A1) drops
documents whose text is dominated by repeated lines or n-grams — boilerplate,
keyword-stuffed spam, scraper loops. The reference pipeline has no analog
(its records are publication metadata, not page text), so this module is a
graft addition: the same signals, computed as pure Catalyst expressions so
the whole thing runs JVM-side with ZERO shuffles — every statistic is a
per-document fold over an array column.

Two signal families:

- ``top_ngram_char_frac(toks, n)``: fraction of n-gram occurrence
  characters claimed by the single most frequent n-gram. High = one
  phrase dominates the document.
- ``dup_ngram_char_frac(toks, n)``: fraction of n-gram occurrence
  characters contributed by occurrences AFTER the first of each distinct
  n-gram. High = the document repeats itself (n=1 with lines as "tokens"
  gives Gopher's duplicate-line character fraction).

Both are computed by sorting the n-gram array and folding once over it
with a (prev, run, best, dup, total) accumulator — O(G log G) per row,
no explode, no groupBy. The denominator is the total character length of
all n-gram occurrences (gram text including internal separators), which
makes the two fractions exact complements of "unique mass" and keeps the
DuckDB oracle a plain GROUP BY.

Shingle construction reuses `word_shingles_ordered`, so short-document
semantics (fewer than n tokens → the whole token run as one shingle,
empty → empty) are identical to every other n-gram consumer in the repo.
The same per-element re-evaluation caveat applies: for pipeline use pass
a materialized token ATTRIBUTE, not a composed expression (see
`word_shingles_from_tokens`'s docstring); the convenience wrappers here
are for gates and small inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.normalize import tokens_col, word_shingles_ordered

__all__ = [
    "top_char_frac_of",
    "dup_char_frac_of",
    "top_ngram_char_frac",
    "dup_ngram_char_frac",
    "repetition_cols",
    "repetition_keep",
]

def _run_fold(grams: Column) -> Column:
    """Fold over the SORTED gram array tracking the current equal-run and
    three aggregates. After sorting, every distinct gram's occurrences are
    adjacent, so a single linear pass recovers per-gram counts:

    - ``best``  = max over grams of count * length  (top-gram char mass)
    - ``dup``   = sum over grams of (count-1) * length (duplicate mass)
    - ``total`` = sum of length over all occurrences

    ``run * length(w)`` peaks at the last element of each equal run, so
    taking ``greatest`` at every step yields the true per-gram maximum.
    """
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
        F.lit(0).cast("bigint").alias("dup"),
        F.lit(0).cast("bigint").alias("total"),
    )

    def step(acc: Column, w: Column) -> Column:
        is_rep = acc["prev"].isNotNull() & (acc["prev"] == w)
        run = F.when(is_rep, acc["run"] + 1).otherwise(F.lit(1))
        char = F.length(w).cast("bigint")
        return F.struct(
            w.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run * char).alias("best"),
            (acc["dup"] + F.when(is_rep, char).otherwise(F.lit(0))).alias("dup"),
            (acc["total"] + char).alias("total"),
        )

    return F.aggregate(F.array_sort(grams), zero, step)


def top_char_frac_of(arr: Column) -> Column:
    """Character fraction of the most frequent element of an arbitrary
    string array (double; 0.0 for empty arrays). Lines, paragraphs, and
    shingles all route through this one fold."""
    st = _run_fold(arr)
    return F.when(
        st["total"] > 0, st["best"].cast("double") / st["total"].cast("double")
    ).otherwise(F.lit(0.0))


def dup_char_frac_of(arr: Column) -> Column:
    """Character fraction contributed by repeat occurrences of elements
    of an arbitrary string array (double; 0.0 for empty arrays)."""
    st = _run_fold(arr)
    return F.when(
        st["total"] > 0, st["dup"].cast("double") / st["total"].cast("double")
    ).otherwise(F.lit(0.0))


def top_ngram_char_frac(toks: Column, n: int) -> Column:
    """Character fraction of the most frequent word n-gram (double; 0.0
    for documents with no grams)."""
    return top_char_frac_of(word_shingles_ordered(toks, n))


def dup_ngram_char_frac(toks: Column, n: int) -> Column:
    """Character fraction contributed by repeat occurrences of word
    n-grams (double; 0.0 for documents with no grams)."""
    return dup_char_frac_of(word_shingles_ordered(toks, n))


def repetition_cols(col: Column | str) -> dict[str, Column]:
    """The standard repetition panel over a text column: top-2-gram,
    top-3-gram, and duplicate-5-gram character fractions (Gopher's most
    discriminative trio). Convenience form — tokenizes inline; pipelines
    should materialize `tokens_col` first and call the per-signal
    functions on the attribute."""
    toks = tokens_col(col)
    return {
        "top_2gram_char_frac": top_ngram_char_frac(toks, 2),
        "top_3gram_char_frac": top_ngram_char_frac(toks, 3),
        "dup_5gram_char_frac": dup_ngram_char_frac(toks, 5),
    }


def repetition_keep(
    col: Column | str | None = None,
    *,
    cols: dict[str, Column] | None = None,
    max_top2: float = 0.20,
    max_top3: float = 0.18,
    max_dup5: float = 0.15,
) -> Column:
    """Gopher-style admission verdict from the repetition panel (defaults
    are the published thresholds). True = keep. Pass ``cols`` (a
    `repetition_cols` result) to reuse already-built expressions."""
    c = cols if cols is not None else repetition_cols(col)
    return (
        (c["top_2gram_char_frac"] <= max_top2)
        & (c["top_3gram_char_frac"] <= max_top3)
        & (c["dup_5gram_char_frac"] <= max_dup5)
    )
