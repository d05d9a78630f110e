"""Blocking: key extraction + per-key size accounting.

Reference semantics (SURVEY.md §2.3): fuzzycat's cluster step — key
extraction → GNU-sort → itertools.groupby → `{"k","v"}` docs with
min/max-cluster-size screens (`/root/reference/notes/old_pipeline.md:19-23`,
`/root/reference/fuzzycat/__main__.py:220-223`). Here the shuffle IS the
sort, partitioned by key — which also fixes the reference's round-robin
sharding bug (`notes/old_pipeline.md:157-164`) where clusters were split
across workers.

Scale notes: we never materialize `{"k", v:[records]}` cluster docs — that
would shuffle full payloads (the reference carries complete records through
its sort; `notes/old_pipeline.md:51-53`). We shuffle only (id, key) and
re-join payloads when a verifier needs them (column pruning does the rest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_block_key(df: DataFrame, key: Column, id_col: str = "url") -> DataFrame:
    """Project to (id, block_key), dropping rows with null/empty keys.

    Empty-key rows correspond to the reference's `key_empty` counter
    (`notes/old_pipeline.md:106-112`); use `block_stats` for the counts.
    """
    return (
        df.select(F.col(id_col).alias("id"), key.alias("block_key"))
        .filter(F.col("block_key").isNotNull() & (F.col("block_key") != ""))
    )


def with_block_sizes(keyed: DataFrame) -> DataFrame:
    """Append per-key group size without a join (single shuffle on key).

    The window has no ORDER BY, so it is a streaming count over the
    key-partitioned exchange — and the downstream self-join on block_key
    reuses the same hash partitioning (no second shuffle of this side).
    """
    w = Window.partitionBy("block_key")
    return keyed.withColumn("block_size", F.count(F.lit(1)).over(w))


def block_stats(df: DataFrame, key: Column, id_col: str = "url") -> DataFrame:
    """Clustering counters, mirroring the reference's
    `{key_ok, key_empty, num_clusters}` (`notes/old_pipeline.md:106-112`)
    plus the cluster-size histogram it reports
    (`notes/2020_11_testruns.md:58-82`). One aggregate pass.
    """
    # empty/null keys fold into ONE null group, so the whole stat set is a
    # single scan + two chained aggregations — no separate eager count()
    # job for the empties (that was a hidden second scan of the input)
    norm_key = F.when(key.isNull() | (key == ""), F.lit(None)).otherwise(key)
    per_key = (
        df.select(norm_key.alias("block_key"))
        .groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
    )
    ok = F.col("block_key").isNotNull()
    return per_key.agg(
        F.coalesce(F.sum(F.when(ok, F.col("cluster_size"))), F.lit(0)).alias("key_ok"),
        F.count(F.when(ok, F.lit(1))).alias("num_clusters"),
        F.coalesce(
            F.sum(F.when(ok & (F.col("cluster_size") >= 2), 1).otherwise(0)),
            F.lit(0),
        ).alias("num_multi_clusters"),
        F.coalesce(F.max(F.when(ok, F.col("cluster_size"))), F.lit(0)).alias(
            "max_cluster_size"
        ),
        F.coalesce(
            F.sum(F.when(~ok, F.col("cluster_size"))), F.lit(0)
        ).alias("key_empty"),
    )
