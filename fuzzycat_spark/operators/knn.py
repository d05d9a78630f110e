"""Similarity search over embedding columns: brute-force cosine top-k
(the exactness baseline) and random-hyperplane LSH bucketing (the scale
path for 10^9+ vectors).

The reference's online candidate retrieval (`matching.py:76-181`, ES fuzzy
queries) maps to this: probe vectors -> bucketed candidates -> exact
re-rank, the batch analog of its search-then-verify loop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, computed in
    double precision with index-order summation (oracle-reproducible)."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(F.transform(ad, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    nb = F.sqrt(F.aggregate(F.transform(bd, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))
    return dot / (na * nb)


def brute_force_knn(
    probes: DataFrame,
    index: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: broadcast the smaller side, rank per probe.

    At scale the index side is the big one — Spark broadcasts `index` only
    if it fits; for larger indexes use `hyperplane_knn` below.
    """
    a = probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("ea"))
    b = index.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("eb"))
    sim = cosine_col(F.col("ea"), F.col("eb"))
    joined = a.join(F.broadcast(b), F.col("probe_id") != F.col("neighbor_id")).select(
        "probe_id", "neighbor_id", sim.alias("cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        joined.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def hyperplane_planes(dim: int, n_planes: int = 12, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (unit-free; only the sign matters)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def hyperplane_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket string from literal hyperplanes — pure Catalyst
    (zip_with dot products against array literals), so the same expression
    is DuckDB-expressible for the oracle."""
    vd = F.transform(vec, lambda x: x.cast("double"))
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(vd, F.lit(p).cast("array<double>"), lambda x, y: x * y),
                F.lit(0.0),
                lambda s, v: s + v,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def hyperplane_knn(
    probes: DataFrame,
    index: DataFrame,
    k: int = 5,
    n_planes: int = 10,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets, exact re-rank
    within the bucket join. One shuffle on bucket keys; no cross join.

    Recall improves with fewer planes (bigger buckets) — callers trade
    bucket size vs recall. Pairs in different buckets are unreachable, the
    standard ANN tradeoff.
    """
    if dim is None:
        dim = len(probes.select(vec_col).first()[0])
    planes = hyperplane_planes(dim, n_planes, seed)
    a = probes.select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("ea"),
        hyperplane_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    b = index.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("eb"),
        hyperplane_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    joined = a.join(b, on="bucket").filter(F.col("probe_id") != F.col("neighbor_id"))
    sim = cosine_col(F.col("ea"), F.col("eb"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        joined.select("probe_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )
