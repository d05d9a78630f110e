"""Crawl delta — classify pages between two crawl snapshots.

Recrawl pipelines need the delta before anything else runs: which pages
are new (extract + dedup + admit), which vanished (tombstone), which
changed (re-verify), which are byte-identical (skip — the overwhelming
majority on a weekly recrawl). The reference has no analog (fuzzycat
compares records within one corpus); this is the between-corpus
counterpart of `functions/urls.latest_revision`'s within-corpus
revisit collapse.

Key identity: compose upstream with `functions.urls.surt_key`
(canonical URL identity) and `functions.urls.latest_revision` (pick
the NEWEST snapshot per key) exactly as `q_crawl_delta` does. Each
side is additionally collapsed here to one row per key with the
order-free min-md5 representative, so duplicate keys can never
multiply through the join: a side that still carries several distinct
versions of a key compares its smallest content hash — identical
version sets read unchanged, and a genuinely-new version errs toward
'changed' (re-processing, never data loss). When recency matters,
collapse with latest_revision first and the min() is an identity.

Scale shape: each side reduces to (key, md5) inside the scan — page
text never shuffles; the per-side collapse is a partial-aggregated
min() whose hash partitioning the full-outer join reuses. SURT keys
range-partition by registered domain, so a per-domain recrawl diff
prunes to the domain's partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.hashing import content_hash

__all__ = ["crawl_delta"]


def crawl_delta(
    old: DataFrame,
    new: DataFrame,
    *,
    key_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """(key, status, old_hash, new_hash) per key in either snapshot:

    - added:     key only in `new`
    - removed:   key only in `old`
    - changed:   both sides, content md5 differs
    - unchanged: both sides, content md5 identical

    NULL text hashes like empty text (md5 of zero bytes) — a page that
    lost its payload between crawls reads as changed, not removed.
    """
    o = (
        old.select(
            F.col(key_col).alias("key"),
            content_hash(F.coalesce(F.col(text_col), F.lit(""))).alias(
                "_h"
            ),
        )
        .groupBy("key")
        .agg(F.min("_h").alias("old_hash"))
    )
    n = (
        new.select(
            F.col(key_col).alias("key"),
            content_hash(F.coalesce(F.col(text_col), F.lit(""))).alias(
                "_h"
            ),
        )
        .groupBy("key")
        .agg(F.min("_h").alias("new_hash"))
    )
    return o.join(n, "key", "full_outer").select(
        "key",
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_hash",
        "new_hash",
    )
