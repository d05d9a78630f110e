"""Candidate-pair generation: equi self-join within blocks.

Reference semantics: `itertools.combinations(vs, r=2)` per cluster doc
(`/root/reference/fuzzycat/verify.py:133`) with the singleton skip
(`verify.py:127-128`) and the max-cluster-size skew guard
(`verify.py:130-131`, default 10 at `__main__.py:220-223`).

Spark-first: the combination enumeration is an equi self-join on block_key
with `id_a < id_b` as the unordered-pair dedup. Catalyst picks
sort-merge/shuffled-hash per AQE; the skew guard is explicit (blocks larger
than `max_block_size` are excluded from the quadratic blowup but *counted*,
mirroring Reason.MAX_CLUSTER_SIZE_EXCEEDED — never silently dropped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.operators.blocking import with_block_key, with_block_sizes

DEFAULT_MAX_BLOCK = 100


def block_pairs(
    df: DataFrame,
    key: Column,
    id_col: str = "url",
    min_block_size: int = 2,
    max_block_size: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """(id_a, id_b, block_key) candidate pairs from an equi self-join.

    Only (id, key) is shuffled — payload columns are pruned here and joined
    back by the verifier, so a 100 TB `html` column never crosses the wire.
    """
    keyed = with_block_sizes(with_block_key(df, key, id_col))
    eligible = keyed.filter(F.col("block_size") >= min_block_size)
    if max_block_size is not None:
        eligible = eligible.filter(F.col("block_size") <= max_block_size)
    a = eligible.select(
        F.col("block_key"), F.col("id").alias("id_a")
    )
    b = eligible.select(
        F.col("block_key"), F.col("id").alias("id_b")
    )
    return a.join(b, on="block_key").filter(F.col("id_a") < F.col("id_b"))


def oversize_blocks(
    df: DataFrame,
    key: Column,
    id_col: str = "url",
    max_block_size: int = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """The blocks excluded by the skew guard, with their sizes — the
    accounting the reference does via Reason.MAX_CLUSTER_SIZE_EXCEEDED."""
    keyed = with_block_sizes(with_block_key(df, key, id_col))
    return (
        keyed.filter(F.col("block_size") > max_block_size)
        .groupBy("block_key")
        .agg(F.count(F.lit(1)).alias("block_size"))
    )


def star_pairs(
    df: DataFrame,
    key: Column,
    role_col: str = "role",
    pivot_role: str = "release",
    id_col: str = "url",
    max_block_size: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Star join: compare each block's pivot record against every non-pivot
    member instead of all pairs — the reference's refs.py pattern
    (`/root/reference/fuzzycat/refs.py:42-69`: one release entity vs every
    ref record in the group), avoiding the quadratic blowup.

    Returns (id_a=pivot, id_b=member, block_key)."""
    keyed = with_block_sizes(
        df.select(F.col(id_col).alias("id"), key.alias("block_key"), F.col(role_col).alias("role"))
        .filter(F.col("block_key").isNotNull() & (F.col("block_key") != ""))
    )
    if max_block_size is not None:
        keyed = keyed.filter(F.col("block_size") <= max_block_size)
    pivots = keyed.filter(F.col("role") == pivot_role).select(
        "block_key", F.col("id").alias("id_a")
    )
    members = keyed.filter(F.col("role") != pivot_role).select(
        "block_key", F.col("id").alias("id_b")
    )
    return pivots.join(members, on="block_key")


def status_ranked_matches(
    verified: DataFrame,
    probe_col: str = "id_a",
    k: int = 1,
) -> DataFrame:
    """Top-k matches per probe by status priority — the reference's
    STATUS_SORT ranking (`/root/reference/fuzzycat/simple.py:40-47,100-105`:
    exact < strong < weak < ambiguous, TODO/DIFFERENT dropped, head taken).

    Returns (probe, match, status, rank)."""
    from pyspark.sql.window import Window

    prio = (
        F.when(F.col("status") == "exact", 10)
        .when(F.col("status") == "strong", 20)
        .when(F.col("status") == "weak", 30)
        .when(F.col("status") == "ambiguous", 40)
    )
    other = "id_b" if probe_col == "id_a" else "id_a"
    kept = verified.filter(F.col("status").isin("exact", "strong", "weak", "ambiguous"))
    w = Window.partitionBy(probe_col).orderBy(F.asc("prio"), F.asc(other))
    return (
        kept.withColumn("prio", prio)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col(probe_col).alias("probe"),
            F.col(other).alias("match"),
            "status",
            "rank",
        )
    )


def union_pair_candidates(*pair_dfs: DataFrame) -> DataFrame:
    """Union candidate pairs from several blocking strategies (exact hash,
    slug key, LSH bands, SimHash buckets) and dedupe. Each input must have
    (id_a, id_b); extra columns are dropped before the distinct."""
    out = None
    for p in pair_dfs:
        sel = p.select("id_a", "id_b")
        out = sel if out is None else out.unionByName(sel)
    return out.distinct()
