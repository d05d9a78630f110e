"""Corpus bigram-LM document scoring — the CCNet-style fluency signal.

CCNet (Wenzek et al. 2020) ranks Common-Crawl documents by perplexity
under a language model trained on a reference corpus and keeps the
most-fluent tail; Gopher/RefinedWeb keep variants of the same signal.
The reference pipeline has no analog (fuzzycat verifies metadata pairs,
`/root/reference/fuzzycat/verify.py`); this is the graft's
training-data quality scorer over the kept corpus.

Model: add-one-smoothed bigram LM estimated from the scored corpus
itself (in production the model corpus and the scored corpus may
differ — pass `model_docs`).  For a bigram (w1, w2):

    P(w2 | w1) = (c2(w1, w2) + 1) / (ctx(w1) + V)

where c2 is the corpus bigram count, ctx(w1) = sum_w2 c2(w1, w2) (the
number of bigrams with context w1, so the conditional sums to 1 over
the vocabulary) and V is the distinct-unigram vocabulary size.

Determinism contract (why scores are integers): per-token probabilities
are held in fixed point, p_fp = (c2+1) * scale DIV (ctx+V), and per-doc
aggregates are integer sums — exact, associative, and bit-identical in
any engine regardless of reduction order.  Floating-point log-prob sums
would depend on summation order and on each engine's libm; an oracle
could never hash-match them.  The mean fixed-point probability is a
monotone per-token transform of the same counts the log-domain score
uses, so it ranks documents for filtering just as well; `scale` is the
resolution (1e9 => parts-per-billion; exact while c2 < 9.2e9 — at
larger counts lower `scale`).

Scale shape (the 100 TB story):
- Token text never rides a shuffle: bigrams and contexts are 8-byte
  md5 hashes computed inside whole-stage codegen.
- Model estimation is ONE partial-aggregated shuffle keyed by the
  bigram hash pair; context totals aggregate the (much smaller)
  distinct-bigram table, not the token stream.
- V is a 1-row aggregate cross-joined back via broadcast — no driver
  action, the plan stays lazy.
- Scoring joins the token-stream bigram rows to the model keyed by the
  hash pair (AQE broadcasts small models); the per-doc rollup is a
  partial-aggregated groupBy on the id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.hashing import md5_h64
from fuzzycat_spark.operators.spans import raw_tokens

__all__ = [
    "bigram_rows",
    "bigram_model",
    "doc_lm_scores",
    "lm_perplexity_buckets",
    "dsir_contrast",
]


def bigram_rows(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per bigram OCCURRENCE: (id, h1, h2) where h1 hashes the
    context token and h2 the space-joined bigram.  Documents with fewer
    than two tokens emit nothing (sequence() would otherwise count down
    and fabricate positions)."""
    toks = raw_tokens(text_col)
    n = F.size(toks)
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.struct(
                md5_h64(F.element_at(toks, i + 1)).alias("h1"),
                md5_h64(F.concat_ws(" ", F.slice(toks, i + 1, 2))).alias("h2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<h1:bigint,h2:bigint>>"))
    return docs.select(
        F.col(id_col).alias("_lm_id"), F.explode(pairs).alias("bg")
    ).select("_lm_id", "bg.h1", "bg.h2")


def bigram_model(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(c2, c1, v): bigram counts keyed (h1, h2), context totals keyed
    h1, and the 1-row vocabulary size.  Counts are exact corpus-wide
    occurrence counts (map-side combined)."""
    b = bigram_rows(docs, id_col=id_col, text_col=text_col)
    c2 = b.groupBy("h1", "h2").agg(F.count("*").alias("c"))
    c1 = c2.groupBy("h1").agg(F.sum("c").alias("ctx"))
    v = (
        docs.select(
            F.explode(F.transform(raw_tokens(text_col), md5_h64)).alias("h")
        )
        .agg(F.count_distinct("h").alias("vocab"))
    )
    return c2, c1, v


def doc_lm_scores(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000_000,
    model_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document fluency under the corpus bigram LM.

    Returns (id_col, n_bigrams, hapax_bigrams, sum_p_fp, mean_p_fp):
    - n_bigrams: tokens-1 (0 for docs shorter than 2 tokens);
    - hapax_bigrams: bigram positions whose exact bigram occurs only
      once in the MODEL corpus — the novelty/OOV-ish signal (a doc of
      never-repeated word pairs is either original prose or garbage;
      combined with mean_p_fp it separates the two);
    - sum_p_fp / mean_p_fp: integer fixed-point add-one bigram
      probabilities (see module docstring); mean_p_fp is NULL for
      bigram-less docs.

    When `model_docs` is given the LM is estimated from it instead of
    from `docs` (cross-corpus scoring, as CCNet does with its
    Wikipedia-trained model); bigrams absent from the model score with
    c2 = 0 and the GLOBAL context+V denominator floor (V alone when the
    context itself is unseen).
    """
    c2, c1, v = bigram_model(
        model_docs if model_docs is not None else docs,
        id_col=id_col,
        text_col=text_col,
    )
    b = bigram_rows(docs, id_col=id_col, text_col=text_col)
    scored = (
        b.join(c2, ["h1", "h2"], "left")
        .join(c1, ["h1"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "_lm_id",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            F.coalesce(F.col("ctx"), F.lit(0)).alias("ctx"),
            "vocab",
        )
        .selectExpr(
            "_lm_id",
            "c",
            f"(c + 1L) * {int(scale)}L DIV (ctx + vocab) AS p_fp",
        )
    )
    per_doc = scored.groupBy("_lm_id").agg(
        F.count("*").alias("n_bigrams"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("hapax_bigrams"),
        F.sum("p_fp").alias("sum_p_fp"),
    )
    return (
        docs.select(F.col(id_col))
        .join(per_doc, F.col(id_col) == F.col("_lm_id"), "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("hapax_bigrams", F.lit(0)).alias("hapax_bigrams"),
            F.coalesce("sum_p_fp", F.lit(0)).alias("sum_p_fp"),
            F.expr("CASE WHEN n_bigrams > 0 THEN sum_p_fp DIV n_bigrams END").alias(
                "mean_p_fp"
            ),
        )
    )


def lm_perplexity_buckets(
    scores: DataFrame,
    *,
    id_col: str = "doc_id",
    score_col: str = "mean_p_fp",
    sample_rate: float = 1.0,
    seed: int = 13,
) -> DataFrame:
    """CCNet-style head/middle/tail quality tiers over LM fluency scores.

    CCNet (Wenzek et al. 2020) splits each language's crawl into three
    equal-mass perplexity buckets and trains mostly on the fluent
    "head". This is that split over `doc_lm_scores` output: tertile
    CUTOFFS are estimated from a deterministic hash sample, then every
    document buckets by comparing its integer score to the cutoffs.

    Returns `scores` plus a `bucket` column in ('head','middle','tail'):
    - head:   score >= the sample's top-third boundary value;
    - middle: score >= the two-thirds boundary;
    - tail:   everything else, including unscorable docs (NULL score —
      bigram-less pages are treated as worst, as CCNet does with
      undecodable text).
    Bucketing compares VALUES, so equal scores always land in the same
    bucket regardless of the sample draw.

    Scale shape: exact corpus-wide tertiles would globally sort 10^12
    (score, id) rows; CCNet itself fits cutoffs on a sample. The sample
    here is the shared md5 48-bit Bernoulli grid (partition- and
    retry-invariant, mirrors in any engine — see
    `functions.hashing.md5_field48`), its single-partition rank window
    is bounded by `sample_rate`, and the two cutoffs broadcast back.
    Rank r uses ceil(n/3) / ceil(2n/3); an empty sample leaves both
    cutoffs NULL and every document in 'tail' — callers that FILTER on
    the bucket must treat an everything-tail result as a configuration
    error (jobs/corpus_job.py fails loudly when the kept set empties).

    `scores` is consumed by two plan branches (the cutoff sample and
    the output join); pass a materialized frame (StageCheckpointer /
    `plans.checkpoint.materialize`) when it is expensive to recompute —
    `doc_lm_scores` output is a multi-shuffle LM fit, and corpus_job
    checkpoints it as its own stage before bucketing.
    """
    from fuzzycat_spark.functions.hashing import md5_field48

    from pyspark.sql.window import Window

    thresh = int(sample_rate * (1 << 48))
    sample = scores.select(
        F.col(id_col).alias("_id"), F.col(score_col).alias("_s")
    ).filter(
        F.col("_s").isNotNull() & (md5_field48("_id", seed) < F.lit(thresh))
    )
    w = Window.orderBy(F.col("_s").desc(), F.col("_id").asc())
    ranked = sample.select(
        "_s",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy()).alias("_n"),
    )
    cuts = ranked.agg(
        F.max(
            F.when(F.col("_rn") == F.expr("(_n + 2) DIV 3"), F.col("_s"))
        ).alias("cut_head"),
        F.max(
            F.when(F.col("_rn") == F.expr("(2 * _n + 2) DIV 3"), F.col("_s"))
        ).alias("cut_middle"),
    )
    sc = F.col(score_col)
    return scores.crossJoin(F.broadcast(cuts)).withColumn(
        "bucket",
        F.when(sc.isNull(), F.lit("tail"))
        .when(sc >= F.col("cut_head"), F.lit("head"))
        .when(sc >= F.col("cut_middle"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    ).drop("cut_head", "cut_middle")


def dsir_contrast(
    docs: DataFrame,
    target_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    scale: int = 1_000_000_000,
    background_docs: DataFrame | None = None,
) -> DataFrame:
    """DSIR-style importance contrast (Xie et al. 2023, Data Selection
    via Importance Resampling): how much more target-like than
    background-like each document reads. Returns
    (id_col, n_bigrams, target_fp, background_fp, contrast_fp) where
    target_fp / background_fp are `doc_lm_scores` mean fixed-point
    bigram probabilities under the TARGET-corpus LM and the BACKGROUND
    LM (default: the scored corpus itself, the classic raw-pool side),
    and contrast_fp = target_fp - background_fp. All integer — exact in
    any reduction order, so rankings and threshold keeps are
    cross-engine reproducible; DSIR's log-ratio is replaced by the same
    monotone fixed-point mean the rest of the LM stack uses (see module
    docstring). contrast_fp is NULL for docs with no bigram.

    Selection is the caller's policy: `contrast_fp >= t` for a floor,
    or `mixing.sample_quota` over contrast-ranked strata for exact
    budgets. Scale: two LM estimations (each ONE partial-agg shuffle;
    the target corpus is typically tiny and its model broadcast) and
    two scoring passes sharing the same bigram rows shape."""
    t = doc_lm_scores(
        docs, id_col=id_col, text_col=text_col, scale=scale,
        model_docs=target_docs,
    ).select(
        F.col(id_col).alias("_id"),
        F.col("n_bigrams"),
        F.col("mean_p_fp").alias("target_fp"),
    )
    b = doc_lm_scores(
        docs, id_col=id_col, text_col=text_col, scale=scale,
        model_docs=background_docs,
    ).select(
        F.col(id_col).alias("_id"),
        F.col("mean_p_fp").alias("background_fp"),
    )
    return t.join(b, "_id").select(
        F.col("_id").alias(id_col),
        "n_bigrams",
        "target_fp",
        "background_fp",
        (F.col("target_fp") - F.col("background_fp")).alias("contrast_fp"),
    )
