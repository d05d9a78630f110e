"""Corpus vocabulary / n-gram frequency tables — the counting pass a
tokenizer-training or LM-data pipeline runs over the kept corpus.

The reference has no analog (fuzzycat tokenizes per-record for
similarity, `/root/reference/fuzzycat/utils.py:166-170`); this is the
graft's corpus-level statistics operator: which tokens / word n-grams
dominate the corpus, with deterministic top-k selection.

Scale shape:
- ONE partial-aggregated shuffle keyed by the gram string: a stopword in
  10^8 documents arrives at its reducer pre-combined per upstream
  partition (map-side combine), never as 10^8 rows.
- top-k is `orderBy(...).limit(k)` which Spark plans as
  TakeOrderedAndProject: each partition keeps its own k-heap and the
  driver merges P*k rows — NO global sort, no full shuffle of the
  vocabulary. A 10^9-gram vocabulary costs the count shuffle plus a
  P*k merge.
- The tiebreak (count DESC, gram ASC) makes the selected set
  deterministic, so two engines agree on the boundary rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.operators.spans import raw_tokens

__all__ = ["word_ngrams", "token_ngram_counts"]


def word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (array<string>; empty
    when the document has fewer than n tokens — sequence() would
    otherwise count DOWN). n=1 returns the tokens themselves."""
    if n == 1:
        return toks
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def token_ngram_counts(
    docs: DataFrame,
    n: int = 1,
    top_k: int | None = None,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """(gram, occurrences) over the whole corpus, counted on the raw
    whitespace token stream (`spans.raw_tokens` — the rewrite unit, so
    vocab and span-dedup see the same tokens). `top_k` keeps the k most
    frequent grams with the deterministic (count DESC, gram ASC)
    tiebreak; `min_count` prunes the long tail before it leaves the
    aggregation."""
    grams = word_ngrams(raw_tokens(text_col), n)
    counts = (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("occurrences"))
    )
    if min_count > 1:
        counts = counts.filter(F.col("occurrences") >= min_count)
    if top_k is not None:
        counts = counts.orderBy(
            F.col("occurrences").desc(), F.col("gram")
        ).limit(top_k)
    return counts
