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

__all__ = ["domain_cap"]


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
