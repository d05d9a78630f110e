"""Fixed-point Lloyd k-means (operators/kmeans.py)."""

import pytest
from pyspark.sql import functions as F

from fuzzycat_spark.operators.kmeans import (
    kmeans_assign,
    kmeans_fit,
    kmeans_seeds,
    quantize_vec,
)

S = 1_000_000


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_two_blobs_separate_and_centroids_exact(spark):
    blob_a = [(i, [0.0, float(i % 2) * 2.0]) for i in range(1, 5)]
    blob_b = [(i, [10.0, float(i % 2) * 2.0]) for i in range(11, 15)]
    assign, cents = kmeans_fit(_emb(spark, blob_a + blob_b), k=2, iters=3)
    got = {r.vec_id: r.cluster for r in assign.collect()}
    assert len({got[i] for i in range(1, 5)}) == 1
    assert len({got[i] for i in range(11, 15)}) == 1
    assert got[1] != got[11]
    cv = {r.cid: r.cv for r in cents.collect()}
    # each blob is {(x,0),(x,2)}x2 -> exact mean (x*S, 1*S)
    assert sorted(cv.values()) == [[0, S], [10 * S, S]]


def test_deterministic_across_runs(spark):
    rows = [(i, [float((i * 7) % 5), float((i * 13) % 3)]) for i in range(40)]
    a1, c1 = kmeans_fit(_emb(spark, rows), k=4, iters=2)
    a2, c2 = kmeans_fit(_emb(spark, rows), k=4, iters=2)
    assert sorted(map(tuple, a1.collect())) == sorted(map(tuple, a2.collect()))
    assert sorted(map(lambda r: (r.cid, tuple(r.cv)), c1.collect())) == sorted(
        map(lambda r: (r.cid, tuple(r.cv)), c2.collect())
    )


def test_tie_breaks_to_lowest_cid(spark):
    vecs = _emb(spark, [(1, [0.0, 0.0])]).select(
        "vec_id", quantize_vec("embedding", S).alias("qv")
    )
    cents = spark.createDataFrame(
        [(2, [S, 0]), (1, [-S, 0])], "cid int, cv array<bigint>"
    )
    got = kmeans_assign(vecs, cents).collect()[0]
    assert got.cluster == 1 and got.dist == S * S


def test_empty_cluster_keeps_seed_centroid(spark):
    # 3 identical points, k=2: one centroid ends up owning everything,
    # the other keeps its seed vector instead of going NULL
    rows = [(i, [1.0, 1.0]) for i in range(3)]
    assign, cents = kmeans_fit(_emb(spark, rows), k=2, iters=2)
    cv = {r.cid: r.cv for r in cents.collect()}
    assert len(cv) == 2
    assert all(v is not None and len(v) == 2 for v in cv.values())
    assert {r.cluster for r in assign.collect()} == {1}


def test_semdedup_finds_planted_families_and_caps_mega_cluster(spark):
    from fuzzycat_spark.operators.kmeans import semdedup_pairs

    e = spark.read.parquet(
        "/root/repo/fixtures/embeddings_planted.parquet"
    ).select("vec_id", "embedding")
    pairs = semdedup_pairs(
        e, threshold=0.9, k=4, iters=2, max_cluster_size=200
    ).collect()
    assert len(pairs) > 0
    assert all(r.cosine >= 0.9 for r in pairs)
    # the 210-copy identical-vector family (fixture plants it in one
    # over-cap cluster) must NOT explode into ~22k pairs
    assert len(pairs) < 1000


def test_seeds_are_hash_ranked_prefix(spark):
    rows = [(i, [float(i), 0.0]) for i in range(20)]
    vecs = _emb(spark, rows).select(
        "vec_id", quantize_vec("embedding", S).alias("qv")
    )
    seeds = kmeans_seeds(vecs, 5)
    assert [r.cid for r in seeds.orderBy("cid").collect()] == [1, 2, 3, 4, 5]
    # same k rows regardless of input partitioning
    seeds2 = kmeans_seeds(vecs.repartition(7), 5)
    assert sorted(map(lambda r: (r.cid, tuple(r.cv)), seeds.collect())) == sorted(
        map(lambda r: (r.cid, tuple(r.cv)), seeds2.collect())
    )


def test_lloyd_checkpointer_path_works(spark, tmp_path):
    """The documented checkpointer= parameter: each iteration's centroids
    round-trip through the StageCheckpointer and the fit still converges
    to the same assignment as the uncheckpointed run."""
    from fuzzycat_spark.operators.kmeans import kmeans_fit
    from fuzzycat_spark.plans.checkpoint import StageCheckpointer

    rows = [(i, [float(i % 2) * 10, float(i % 2) * 10]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    plain, _ = kmeans_fit(emb, k=2, iters=2)
    ck = StageCheckpointer(spark, str(tmp_path / "ck"))
    checked, _ = kmeans_fit(emb, k=2, iters=2, checkpointer=ck)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, checked.collect())
    )
