"""Benchmark decontamination — flag training documents that leak eval data.

Standard LLM-pipeline step (GPT-3 appendix C, PaLM, Llama): a training
document is contaminated if it shares an exact word n-gram with any
document of a held-out benchmark suite. n = 8..13 in published pipelines;
the default here is 8, and the gates run n=5 because the synthetic corpus
vocabulary makes longer exact overlaps vanishingly rare.

Scale shape: the eval suite is tiny next to the corpus (thousands of
prompts vs billions of pages), so its distinct n-gram set is BROADCAST —
the corpus never shuffles. Each corpus partition explodes its documents'
distinct shingles, hash-joins them against the broadcast set, and
partially aggregates hit counts per doc before the single narrow
(doc_id, count) shuffle. Nothing text-shaped crosses the wire: the
broadcast carries the eval grams once, the shuffle carries two integers
per surviving doc.

Tokenization is the repo-standard slug (`tokens_col`), so contamination
is case/punctuation-insensitive — "The Quick, Brown Fox!" leaks
"the quick brown fox".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.normalize import (
    tokens_col,
    word_shingles_from_tokens,
)

__all__ = ["eval_ngrams", "decontaminate"]


def eval_ngrams(
    eval_df: DataFrame, text_col: str = "text", n: int = 8
) -> DataFrame:
    """Distinct word n-grams of the eval suite: one `gram` column.
    Short prompts (< n tokens) contribute their whole token run, so even
    a two-word benchmark answer is still matchable."""
    toks = eval_df.select(tokens_col(text_col).alias("_toks"))
    return (
        toks.select(
            F.explode(word_shingles_from_tokens(F.col("_toks"), n)).alias("gram")
        )
        .filter(F.col("gram") != "")
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document contamination verdict against an eval suite:
    (id, n_eval_grams_hit, contaminated). `n_eval_grams_hit` counts
    DISTINCT leaked grams (a doc repeating one leaked phrase five times
    counts once — the question is which eval items leaked, not how
    loudly). Filter `contaminated` to drop, or join back for audit."""
    grams = F.broadcast(eval_ngrams(eval_df, eval_text_col, n))
    doc_grams = docs.select(
        F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks")
    ).select(
        "_id",
        F.explode(word_shingles_from_tokens(F.col("_toks"), n)).alias("gram"),
    )
    hits = (
        doc_grams.join(grams, on="gram", how="inner")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_eval_grams_hit"))
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(hits, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_eval_grams_hit", F.lit(0))
            .cast("long")
            .alias("n_eval_grams_hit"),
            (F.coalesce("n_eval_grams_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )
