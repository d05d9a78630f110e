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


def _flip_bit(bucket: Column, i: int) -> Column:
    """Bucket string with bit i flipped (1-indexed position i+1)."""
    flipped = F.when(F.substring(bucket, i + 1, 1) == "1", F.lit("0")).otherwise(
        F.lit("1")
    )
    return F.concat(
        F.substring(bucket, 1, i), flipped, F.substring(bucket, i + 2, 2048)
    )


def hyperplane_knn(
    probes: DataFrame,
    index: DataFrame,
    k: int = 5,
    n_planes: int = 10,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets, exact re-rank
    within the bucket join. One shuffle on bucket keys; no cross join.

    Recall improves with fewer planes (bigger buckets) or with
    `multiprobe=1`, which ALSO probes every bucket one sign-flip away
    (n_planes+1 keys on the probe side only — the index stays one row per
    vector). Pairs outside the probed buckets are unreachable, the
    standard ANN tradeoff.

    `dim` is required: array columns carry no length in the schema, and
    inferring it would run a hidden driver-side job inside an operator.
    """
    if dim is None:
        raise ValueError(
            "hyperplane_knn requires dim= (the embedding width): the schema "
            "cannot provide it and inferring it would trigger a hidden "
            "driver-side action"
        )
    planes = hyperplane_planes(dim, n_planes, seed)
    bucket = hyperplane_bucket_col(F.col(vec_col), planes)
    if multiprobe:
        probe_buckets = F.array(bucket, *[_flip_bit(bucket, i) for i in range(n_planes)])
        a = probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("ea"),
            F.explode(probe_buckets).alias("bucket"),
        )
    else:
        a = probes.select(
            F.col(id_col).alias("probe_id"),
            F.col(vec_col).alias("ea"),
            bucket.alias("bucket"),
        )
    b = index.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("eb"),
        bucket.alias("bucket"),
    )
    joined = a.join(b, on="bucket").filter(F.col("probe_id") != F.col("neighbor_id"))
    sim = cosine_col(F.col("ea"), F.col("eb"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    out = joined.select("probe_id", "neighbor_id", sim.alias("cosine"))
    if multiprobe:
        out = out.distinct()
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def ivf_centroids(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Deterministic IVF coarse centroids: (cid, centroid array<double>).

    Seeds are the k lowest-id vectors (deterministic and oracle-reproducible;
    at 10^9+ vectors swap for a seeded `df.sample`), refined by `n_iter`
    Lloyd iterations. Each iteration is two shuffles, both bounded:
    assignment broadcasts the k centroids, and the per-position mean
    shuffles (cid, pos) keys — k*dim groups regardless of corpus size.
    Clusters that lose all members drop out (same semantics as the SQL
    GROUP BY); components are rounded so cross-engine float summation
    order cannot flip a downstream argmax.
    """
    w = Window.orderBy(F.asc("id"))
    cents = (
        embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("c"))
        .orderBy("id")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).cast("long").alias("cid"),
            F.transform("c", lambda x: x.cast("double")).alias("centroid"),
        )
    )
    for _ in range(n_iter):
        asg = ivf_assign(embeddings, cents, id_col=id_col, vec_col=vec_col)
        pos_means = (
            embeddings.join(asg, on=embeddings[id_col] == asg["vec_id_"])
            .select("cid", F.posexplode(F.col(vec_col)).alias("pos", "v"))
            .groupBy("cid", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), round_to).alias("av"))
        )
        cents = pos_means.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "av"))), lambda s: s["av"]
            ).alias("centroid")
        )
    return cents


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id_, cid): each vector's nearest centroid by cosine (ties to the
    lowest cid). Broadcast of k rows + a per-row argmax — no shuffle of the
    vector table beyond the window's hash partition on id."""
    joined = embeddings.select(
        F.col(id_col).alias("vec_id_"), F.col(vec_col).alias("e")
    ).crossJoin(F.broadcast(centroids))
    sim = F.round(cosine_col(F.col("e"), F.col("centroid")), 9)
    w = Window.partitionBy("vec_id_").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        joined.select("vec_id_", "cid", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id_", "cid")
    )


def ivf_knn(
    probes: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: the index is partitioned into inverted lists
    by nearest centroid; each probe scans only its `nprobe` nearest lists.

    The scan fraction is ~nprobe/k of the index regardless of corpus size,
    and each vector lives in exactly one list so no post-join distinct is
    needed (unlike multiprobe hyperplane LSH). One shuffle on cid.
    """
    asg = ivf_assign(index, centroids, id_col=id_col, vec_col=vec_col)
    inv = index.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("eb")
    ).join(asg, on=F.col("neighbor_id") == F.col("vec_id_")).drop("vec_id_")
    pj = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("ea")
    ).crossJoin(F.broadcast(centroids))
    psim = F.round(cosine_col(F.col("ea"), F.col("centroid")), 9)
    pw = Window.partitionBy("probe_id").orderBy(F.desc("csim"), F.asc("cid"))
    probe_lists = (
        pj.select("probe_id", "ea", "cid", psim.alias("csim"))
        .withColumn("rn", F.row_number().over(pw))
        .filter(F.col("rn") <= nprobe)
        .select("probe_id", "ea", "cid")
    )
    joined = probe_lists.join(inv, on="cid").filter(
        F.col("probe_id") != F.col("neighbor_id")
    )
    sim = cosine_col(F.col("ea"), F.col("eb"))
    w = Window.partitionBy("probe_id").orderBy(
        F.desc(F.round(F.col("cosine"), 9)), F.asc("neighbor_id")
    )
    return (
        joined.select("probe_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def bucketed_similar_pairs(
    embeddings: DataFrame,
    threshold: float,
    n_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(id_a, id_b, cosine) for same-bucket pairs with cosine >= threshold
    — the bounded-at-scale form of the all-pairs threshold query: one
    shuffle on bucket keys, exact cosine only within buckets. Cross-bucket
    pairs are sacrificed (ANN recall tradeoff); raise recall with fewer
    planes, or route high-stakes tiers through multiprobe hyperplane_knn.
    """
    if dim is None:
        raise ValueError("bucketed_similar_pairs requires dim= (see hyperplane_knn)")
    planes = hyperplane_planes(dim, n_planes, seed)
    bucket = hyperplane_bucket_col(F.col(vec_col), planes)
    t = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("e"), bucket.alias("bucket")
    )
    a = t.select(F.col("id").alias("id_a"), F.col("e").alias("ea"), "bucket")
    b = t.select(F.col("id").alias("id_b"), F.col("e").alias("eb"), "bucket")
    cos = cosine_col(F.col("ea"), F.col("eb"))
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos.alias("cosine"))
        .filter(F.round(F.col("cosine"), 9) >= threshold)
    )
