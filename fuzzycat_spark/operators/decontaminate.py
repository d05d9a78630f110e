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

__all__ = [
    "eval_ngrams",
    "decontaminate",
    "cross_split_contamination",
    "train_overlap_screen",
    "semantic_contamination",
    "semantic_contamination_ann",
]


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


def _split_gram_table(
    docs: DataFrame, id_col: str, text_col: str, split_col: str, n: int
) -> DataFrame:
    """Materialized (_id, _split, gh) distinct-per-row gram hashes of
    every split-assigned doc — the shared input of both cross-split
    operators. The tokenize+shingle pass dominates cost and feeds BOTH
    branches of the downstream join; Spark does not CSE across join
    inputs, so without the materialization the whole corpus would be
    scanned and shingled twice."""
    from fuzzycat_spark.functions.hashing import md5_h64
    from fuzzycat_spark.plans.checkpoint import materialize

    grams = (
        docs.filter(F.col(split_col).isNotNull())
        .select(
            F.col(id_col).alias("_id"),
            F.col(split_col).alias("_split"),
            tokens_col(text_col).alias("_toks"),
        )
        .select(
            "_id",
            "_split",
            F.explode(word_shingles_from_tokens(F.col("_toks"), n)).alias(
                "gram"
            ),
        )
        .filter(F.col("gram") != "")
        .select("_id", "_split", md5_h64(F.col("gram")).alias("gh"))
    )
    return materialize(grams, "xsplit_grams")


def train_overlap_screen(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    train_split: str = "train",
    n: int = 8,
) -> DataFrame:
    """The actionable complement of `cross_split_contamination`: TRAIN
    documents sharing an exact word n-gram with ANY held-out document,
    flagged for removal. Standard practice drops the TRAIN copy (the
    GPT-3 appendix C direction, re-targeted from benchmarks to the
    corpus's own held-out splits) so val/test keep their size and
    integrity while the model never trains on their content.

    Same scale shape as the audit — shared materialized gram table, both
    sides reduced to 64-bit hashes, one narrow semi join — with the
    DISTINCT side now the held-out grams (the smaller side at any
    realistic split fraction, so AQE can broadcast it). Returns
    (id, n_heldout_grams_hit, drop) for every train doc; anti-join the
    `drop` rows against the corpus to apply."""
    grams = _split_gram_table(docs, id_col, text_col, split_col, n)
    held_grams = (
        grams.filter(F.col("_split") != train_split).select("gh").distinct()
    )
    train = (
        grams.filter(F.col("_split") == train_split)
        .select("_id", "gh")
        .distinct()
    )
    hits = (
        train.join(held_grams, on="gh", how="left_semi")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_heldout_grams_hit"))
    )
    return (
        docs.filter(F.col(split_col) == train_split)
        .select(F.col(id_col).alias("_id"))
        .join(hits, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("n_heldout_grams_hit", F.lit(0))
            .cast("long")
            .alias("n_heldout_grams_hit"),
            (F.coalesce("n_heldout_grams_hit", F.lit(0)) > 0).alias("drop"),
        )
    )


def cross_split_contamination(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    split_col: str = "split",
    train_split: str = "train",
    n: int = 8,
) -> DataFrame:
    """Audit cross-split leakage: for every HELD-OUT (non-train) document,
    count its distinct word n-grams that also occur in ANY train document.
    This is the measurement behind split hygiene — run it after
    `assign_splits` (doc-hash routing) vs `assign_splits_by_cluster`
    (dedup-cluster routing) and the near-dup families that straddle under
    the former show up as non-zero `n_train_grams_hit` rows.

    Unlike `decontaminate` (tiny eval suite → broadcast, corpus never
    shuffles), BOTH sides here are corpus-sized, so grams meet in a
    shuffle — but a narrow one: each gram is reduced to the repo-standard
    64-bit md5 (`md5_h64`), the train side is globally DISTINCT hashes
    (partial agg before the exchange), the held-out side distinct
    (id, hash) pairs, and the left-semi join moves two integers per row.
    No text-shaped value crosses the wire. A 64-bit collision could count
    one phantom gram per ~2^64 distinct-pair comparisons — below any
    audit's noise floor (and deterministic, so the gate would catch it).

    `docs` carries (id_col, text_col, split_col); rows with NULL split
    (unassigned remainder) are ignored on both sides. Returns
    (id, split, n_train_grams_hit, contaminated) for held-out docs.
    """
    grams = _split_gram_table(docs, id_col, text_col, split_col, n)
    train_grams = (
        grams.filter(F.col("_split") == train_split).select("gh").distinct()
    )
    held = (
        grams.filter(F.col("_split") != train_split)
        .select("_id", "_split", "gh")
        .distinct()
    )
    hits = (
        held.join(train_grams, on="gh", how="left_semi")
        .groupBy("_id", "_split")
        .agg(F.count(F.lit(1)).alias("n_train_grams_hit"))
    )
    return (
        docs.filter(
            F.col(split_col).isNotNull() & (F.col(split_col) != train_split)
        )
        .select(F.col(id_col).alias("_id"), F.col(split_col).alias("_split"))
        .join(hits, on=["_id", "_split"], how="left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_split").alias(split_col),
            F.coalesce("n_train_grams_hit", F.lit(0))
            .cast("long")
            .alias("n_train_grams_hit"),
            (F.coalesce("n_train_grams_hit", F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
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


def semantic_contamination(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
    eval_vec_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-space eval-overlap screen — the semantic complement of
    the exact n-gram `decontaminate`: a corpus document is contaminated
    if its embedding sits within cosine >= `threshold` of ANY eval-suite
    embedding (paraphrased/reformatted benchmark leakage that exact
    n-grams miss; the screen used by phi-/FineWeb-style pipelines).

    This is the EXACT brute path: the eval suite is tiny next to the
    corpus (thousands of prompts vs billions of pages), so it is
    BROADCAST and every (corpus, eval) cosine is evaluated JVM-side
    (`cosine_col` — zip_with/aggregate in double precision, no Python).
    The corpus never shuffles text or vectors; the single narrow shuffle
    carries (id, max_cos, hits). Cost is |corpus| x |eval| fused
    multiply-adds inside whole-stage codegen — linear in the corpus, the
    right shape at 10^12 docs. For eval suites too big to broadcast, use
    `semantic_contamination_ann`.

    Returns (id_col, max_eval_cos, n_eval_hits, contaminated) for every
    corpus row; `max_eval_cos` is the max over ALL eval vectors (rounded
    to 6 dp for cross-engine stability), `n_eval_hits` counts eval
    vectors at round(cos, 9) >= threshold.
    """
    from fuzzycat_spark.operators.knn import cosine_col

    eval_id_col = eval_id_col or id_col
    eval_vec_col = eval_vec_col or vec_col
    ev = F.broadcast(
        eval_df.select(F.col(eval_vec_col).alias("_evec"))
    )
    cos = cosine_col(F.col("_cvec"), F.col("_evec"))
    scored = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_cvec"))
        .join(ev)
        .select(
            "_id",
            F.round(cos, 6).alias("_c6"),
            (F.round(cos, 9) >= F.lit(threshold)).cast("int").alias("_hit"),
        )
        .groupBy("_id")
        .agg(
            F.max("_c6").alias("max_eval_cos"),
            F.sum("_hit").cast("long").alias("n_eval_hits"),
        )
    )
    return (
        corpus.select(F.col(id_col).alias("_id"))
        .join(scored, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            "max_eval_cos",
            F.coalesce("n_eval_hits", F.lit(0)).cast("long").alias("n_eval_hits"),
            (F.coalesce("n_eval_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def semantic_contamination_ann(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str | None = None,
    eval_vec_col: str | None = None,
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int | None = None,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """The LSH-bucketed scale path of `semantic_contamination`: both
    sides hash to random-hyperplane buckets (the shared ANN machinery,
    `operators/knn.py`), cosines are evaluated only for (corpus, eval)
    pairs sharing a bucket, and CORPUS-side buckets above
    `max_bucket_size` are excluded — the same index-side-only skew guard
    as `hyperplane_knn` (eval probes are never dropped). Only
    (id, bucket) rows enter the bucket join; vectors join back for the
    surviving candidates.

    Use when the eval suite itself is too large to broadcast or when
    |corpus| x |eval| brute cosines are too many; recall is bucket-bound
    (a >= threshold pair in different buckets is missed — raise
    `n_planes` granularity or probe more buckets upstream to trade).

    Returns (id_col, max_eval_cos, n_eval_hits, contaminated);
    `max_eval_cos` is NULL for corpus rows with no same-bucket eval
    candidate (vs the brute variant's max over all eval vectors).
    """
    from fuzzycat_spark.operators.knn import (
        DEFAULT_MAX_BUCKET,
        _capped_index_buckets,
        cosine_col,
        hyperplane_bucket_col,
        hyperplane_planes,
    )

    if dim is None:
        raise ValueError("semantic_contamination_ann requires dim=")
    if max_bucket_size is None:
        max_bucket_size = DEFAULT_MAX_BUCKET
    eval_id_col = eval_id_col or id_col
    eval_vec_col = eval_vec_col or vec_col
    planes = hyperplane_planes(dim, n_planes, seed)

    cb = _capped_index_buckets(
        corpus,
        hyperplane_bucket_col(F.col(vec_col), planes),
        id_col,
        "_cid",
        max_bucket_size,
    )
    eb = F.broadcast(
        eval_df.select(
            F.col(eval_id_col).alias("_eid"),
            hyperplane_bucket_col(F.col(eval_vec_col), planes).alias("bucket"),
        )
    )
    cand = cb.join(eb, on="bucket").select("_cid", "_eid")
    cvec = corpus.select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("_cvec"))
    evec = F.broadcast(
        eval_df.select(F.col(eval_id_col).alias("_eid"), F.col(eval_vec_col).alias("_evec"))
    )
    cos = cosine_col(F.col("_cvec"), F.col("_evec"))
    scored = (
        cand.join(cvec, on="_cid")
        .join(evec, on="_eid")
        .select(
            "_cid",
            F.round(cos, 6).alias("_c6"),
            (F.round(cos, 9) >= F.lit(threshold)).cast("int").alias("_hit"),
        )
        .groupBy("_cid")
        .agg(
            F.max("_c6").alias("max_eval_cos"),
            F.sum("_hit").cast("long").alias("n_eval_hits"),
        )
    )
    return (
        corpus.select(F.col(id_col).alias("_cid"))
        .join(scored, on="_cid", how="left")
        .select(
            F.col("_cid").alias(id_col),
            "max_eval_cos",
            F.coalesce("n_eval_hits", F.lit(0)).cast("long").alias("n_eval_hits"),
            (F.coalesce("n_eval_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
