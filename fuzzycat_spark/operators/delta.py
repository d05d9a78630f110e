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

__all__ = ["crawl_delta", "content_moves"]


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


def content_moves(delta: DataFrame) -> DataFrame:
    """Moved content between the two snapshots of a `crawl_delta`:
    content whose md5 left at least one URL ('removed') AND appeared at
    at least one new URL ('added') — the recrawl case URL-keyed deltas
    misread as destroy+create. A downstream pipeline lets the new URL
    inherit the old page's cluster/admission instead of re-running
    extraction + dedup on it.

    One row per moved content hash: (content_h, old_key, new_key,
    n_old_gone, n_new_added) with the lexicographically-smallest key on
    each side as the deterministic representative. Content that ALSO
    still lives unchanged at a third URL still reports — the signal is
    "this added URL carries known bytes", which holds regardless.

    Scale shape: two filters over the already-reduced delta rows (key +
    two md5s — text never reaches this operator), two partial-aggregated
    groupBys on the hash, one equi join of the (small) removed side
    against the (small) added side. Nothing here is corpus-sized on a
    weekly recrawl, where added/removed are the thin tails."""
    gone = (
        delta.where(F.col("status") == "removed")
        .select(F.col("old_hash").alias("content_h"), "key")
        .groupBy("content_h")
        .agg(
            F.min("key").alias("old_key"),
            F.count("*").cast("long").alias("n_old_gone"),
        )
    )
    came = (
        delta.where(F.col("status") == "added")
        .select(F.col("new_hash").alias("content_h"), "key")
        .groupBy("content_h")
        .agg(
            F.min("key").alias("new_key"),
            F.count("*").cast("long").alias("n_new_added"),
        )
    )
    return gone.join(came, "content_h").select(
        "content_h", "old_key", "new_key", "n_old_gone", "n_new_added"
    )
