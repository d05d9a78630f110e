"""Per-domain document caps — source-diversity control for corpus curation.

Web corpora are dominated by a few giant hosts; training-data pipelines
cap the number of pages kept per registered domain (C4 kept max ~?
per-host heuristics; RefinedWeb and FineWeb both apply per-domain
limits) so one wiki mirror cannot be ten percent of the corpus. This
operator keeps the top-k documents per domain by a quality score.

Scale shape: a naive `row_number() OVER (PARTITION BY domain)` puts an
entire mega-domain (10^8 pages of one blog platform) into ONE task. The
cap is computed in two exact stages instead:

1. rank within (domain, salt) where salt = hash(id) mod S, keep k per
   salted group — any single sort task sees at most domain_size / S rows;
2. rank within domain over the survivors (at most k*S rows per domain —
   bounded by CONSTANTS, not data), keep k.

Per-salt top-k is a superset of the global top-k restricted to that
salt, so the composition is exact. Both shuffles carry only
(id, domain, quality) — the page payload joins back afterwards if the
caller wants it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fuzzycat_spark.functions.text import quality_score_cols

__all__ = ["domain_cap", "host_quality_stats", "host_quality_screen"]


def domain_cap(
    docs: DataFrame,
    domain_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_per_domain: int = 10,
    quality_col: str | None = None,
    salt: int = 16,
) -> DataFrame:
    """Top `max_per_domain` documents per domain by quality (desc, ties →
    min id): (id, domain, quality, rank). `quality_col` names a
    precomputed score on `docs`; otherwise the native Catalyst blend is
    computed on the fly. Deterministic and partition-independent."""
    if quality_col is None:
        q: Column = quality_score_cols(text_col)["quality"]
    else:
        q = F.col(quality_col).cast("double")
    narrow = docs.select(
        F.col(id_col).alias("id"),
        F.col(domain_col).alias("domain"),
        q.alias("quality"),
    )
    order = [F.col("quality").desc(), F.col("id").asc()]
    pre = Window.partitionBy(
        "domain", F.pmod(F.xxhash64("id"), F.lit(salt))
    ).orderBy(*order)
    survivors = (
        narrow.withColumn("_r", F.row_number().over(pre))
        .filter(F.col("_r") <= max_per_domain)
        .drop("_r")
    )
    final = Window.partitionBy("domain").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= max_per_domain)
        .select("id", "domain", "quality", "rank")
    )


def host_quality_stats(
    docs: DataFrame,
    host_col: str,
    text_col: str = "text",
    min_mean_quality_fp: int = 0,
    min_docs: int = 1,
) -> DataFrame:
    """Host-level quality verdicts — the RefinedWeb/FineWeb-style screen
    that drops WHOLE sites, not single pages: a content farm's every
    page scores mediocre, and page-level thresholds leak its long tail.
    Returns (host, n_docs, mean_quality_fp, keep) with keep = host has
    >= min_docs pages AND mean quality >= the threshold.

    The mean is exact integer arithmetic: per-page quality quantizes to
    1e6 fixed point (floor), the per-host sum is int64, and the mean is
    TRUNCATING integer division (`div`) — reduction-order-free and
    hash-matchable cross-engine, unlike a float mean. Thresholds are
    fixed-point too (666000 = 0.666).

    Scale: ONE partial-aggregated shuffle of (host, int64) rows; the
    verdict table is hosts-sized and broadcastable into
    `host_quality_screen`."""
    q = quality_score_cols(text_col)["quality"]
    fp = F.floor(F.round(q, 6) * F.lit(1_000_000)).cast("long")
    agg = (
        docs.select(F.col(host_col).alias("host"), fp.alias("_qfp"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_qfp").alias("_sum"),
        )
    )
    mean = F.expr("_sum div n_docs")
    return agg.select(
        "host",
        "n_docs",
        mean.alias("mean_quality_fp"),
        (
            (F.col("n_docs") >= F.lit(min_docs))
            & (mean >= F.lit(min_mean_quality_fp))
        ).alias("keep"),
    )


def host_quality_screen(
    docs: DataFrame,
    host_col: str,
    text_col: str = "text",
    min_mean_quality_fp: int = 0,
    min_docs: int = 1,
) -> DataFrame:
    """Drop every page of every host failing `host_quality_stats` — the
    verdict table broadcasts (hosts-sized), the corpus pays one
    BroadcastHashJoin left-semi, zero extra shuffles on the page side
    beyond the stats aggregation itself."""
    kept = (
        host_quality_stats(
            docs, host_col, text_col, min_mean_quality_fp, min_docs
        )
        .filter(F.col("keep"))
        .select(F.col("host").alias(host_col))
    )
    return docs.join(F.broadcast(kept), on=host_col, how="left_semi")
