"""Product quantization (operators/pq.py)."""

import pytest
from pyspark.sql import functions as F

from fuzzycat_spark.operators.pq import pq_encode, pq_fit, pq_knn

S = 1_000_000


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _blobs(n_per=6):
    # four well-separated cells in a 4-dim space split as m=2 subspaces:
    # subspace 0 (dims 0-1) near (0,0) or (10,10); subspace 1 likewise
    rows = []
    vid = 0
    for a in (0.0, 10.0):
        for b in (0.0, 10.0):
            for i in range(n_per):
                eps = 0.01 * (i + 1)
                rows.append((vid, [a + eps, a, b, b + eps]))
                vid += 1
    return rows


def test_codes_separate_blobs_and_are_stable(spark):
    emb = _emb(spark, _blobs())
    books = pq_fit(emb, m=2, k=2, iters=2, dim=4)
    codes = {
        r.vec_id: tuple(r.codes)
        for r in pq_encode(emb, books, m=2, sd=2).collect()
    }
    # each of the four (a, b) cells gets one distinct (code0, code1) pair
    cells = [frozenset(codes[v] for v in range(c * 6, c * 6 + 6)) for c in range(4)]
    assert all(len(c) == 1 for c in cells)
    assert len(set(cells)) == 4
    # codes are (subspace-local) cluster ids 1..k
    assert all(1 <= c <= 2 for pair in codes.values() for c in pair)


def test_identical_vectors_identical_codes(spark):
    rows = [(i, [1.5, -2.0, 3.0, 0.25]) for i in range(5)] + [
        (i, [9.0, 9.0, -9.0, -9.0]) for i in range(10, 14)
    ]
    emb = _emb(spark, rows)
    books = pq_fit(emb, m=2, k=2, iters=2, dim=4)
    got = [tuple(r.codes) for r in pq_encode(emb, books, m=2, sd=2).collect()]
    assert len(set(got)) == 2


def test_adc_knn_finds_true_neighbors(spark):
    emb = _emb(spark, _blobs())
    probes = spark.createDataFrame([(0,), (18,)], "vec_id bigint")
    got = pq_knn(emb, probes, topk=5, m=2, k=4, iters=2, dim=4).collect()
    by_probe = {}
    for r in got:
        by_probe.setdefault(r.probe_id, []).append(r)
    for pid, rows in by_probe.items():
        assert len(rows) == 5
        assert all(r.vec_id != pid for r in rows)
        # top-5 of a 6-element cell = the 5 same-cell companions
        cell = set(range((pid // 6) * 6, (pid // 6) * 6 + 6)) - {pid}
        assert {r.vec_id for r in rows} == cell
        ranks = sorted((r.rank, r.adist) for r in rows)
        assert [x[0] for x in ranks] == [1, 2, 3, 4, 5]
        assert [x[1] for x in ranks] == sorted(x[1] for x in ranks)


def test_deterministic_across_runs(spark):
    emb = _emb(spark, _blobs())
    probes = spark.createDataFrame([(0,)], "vec_id bigint")
    a = sorted(map(tuple, pq_knn(emb, probes, topk=3, m=2, k=2, dim=4).collect()))
    b = sorted(map(tuple, pq_knn(emb, probes, topk=3, m=2, k=2, dim=4).collect()))
    assert a == b


def test_dim_not_divisible_raises(spark):
    emb = _emb(spark, [(0, [1.0, 2.0, 3.0])])
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(emb, m=2, k=2, iters=1, dim=3)


def test_encode_plan_is_broadcast_only(spark):
    """The per-vector encode path: no sort-merge join, the codebooks ride
    a broadcast, and the only exchanges belong to the k-row codebook
    aggregation (never keyed by vec rows)."""
    emb = _emb(spark, _blobs())
    # materialize the trained codebooks (pipelines checkpoint them) so the
    # plan under test is the ENCODE path, not the Lloyd training lineage
    books = spark.createDataFrame(
        pq_fit(emb, m=2, k=2, iters=1, dim=4).collect(),
        "m int, cid int, cv array<bigint>",
    )
    plan = pq_encode(emb, books, m=2, sd=2)._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "vec_id" not in line, line


def test_ivfadc_finds_true_neighbors(spark):
    from fuzzycat_spark.operators.pq import ivfadc_knn

    emb = _emb(spark, _blobs())
    probes = spark.createDataFrame([(0,), (13,)], "vec_id bigint")
    got = ivfadc_knn(
        emb, probes, topk=5, kc=4, m=2, k=2, iters=2, nprobe=1, dim=4
    ).collect()
    by_probe = {}
    for r in got:
        by_probe.setdefault(r.probe_id, []).append(r)
    assert set(by_probe) == {0, 13}
    for pid, rows in by_probe.items():
        # nprobe=1 over well-separated blobs: only the probe's own coarse
        # cell is visited, and its 5 companions fill the whole top-5
        assert len(rows) == 5
        cell = set(range((pid // 6) * 6, (pid // 6) * 6 + 6)) - {pid}
        assert {r.vec_id for r in rows} == cell
        assert len({r.cluster for r in rows}) == 1
        ranks = sorted((r.rank, r.adist) for r in rows)
        assert [x[0] for x in ranks] == [1, 2, 3, 4, 5]


def test_ivfadc_nprobe_widens_candidates(spark):
    from fuzzycat_spark.operators.pq import ivfadc_knn

    emb = _emb(spark, _blobs())
    probes = spark.createDataFrame([(0,)], "vec_id bigint")
    narrow = ivfadc_knn(
        emb, probes, topk=23, kc=4, m=2, k=2, iters=2, nprobe=1, dim=4
    ).count()
    wide = ivfadc_knn(
        emb, probes, topk=23, kc=4, m=2, k=2, iters=2, nprobe=4, dim=4
    ).count()
    # nprobe=1 surfaces only the probe's own inverted list (a strict
    # subset of the corpus — coarse cells may merge blobs, but never
    # cover all 24 vectors); nprobe=4 scans every list and fills topk
    assert narrow < wide
    assert wide == 23


def test_ivfadc_deterministic_across_runs(spark):
    from fuzzycat_spark.operators.pq import ivfadc_knn

    emb = _emb(spark, _blobs())
    probes = spark.createDataFrame([(7,)], "vec_id bigint")
    a = sorted(map(tuple, ivfadc_knn(emb, probes, topk=4, kc=2, m=2, k=2, nprobe=2, dim=4).collect()))
    b = sorted(map(tuple, ivfadc_knn(emb, probes, topk=4, kc=2, m=2, k=2, nprobe=2, dim=4).collect()))
    assert a == b


def test_fused_subspace_fit_matches_sequential_lloyd(spark):
    """Round-6 refactor pin: `_fit_subspaces` runs ONE fused Lloyd loop
    over the subspace-tagged slice table; the codebooks must be
    row-for-row identical to the reference composition it replaced —
    M independent `lloyd_fit` runs over sliced views."""
    from pyspark.sql import functions as F

    from fuzzycat_spark.operators.kmeans import lloyd_fit, quantize_vec
    from fuzzycat_spark.operators.pq import _fit_subspaces

    emb = _emb(spark, _blobs())
    m, k, iters, sd = 2, 2, 2, 2
    vecs = emb.select(
        F.col("vec_id"), quantize_vec("embedding", S).alias("qv")
    )
    fused = sorted(
        (r.m, r.cid, tuple(r.cv))
        for r in _fit_subspaces(vecs, m, k, iters, sd, "vec_id").collect()
    )
    seq = []
    for j in range(m):
        sub = vecs.select(
            F.col("vec_id"), F.slice("qv", j * sd + 1, sd).alias("qv")
        )
        _, cents = lloyd_fit(sub, k, iters, id_col="vec_id")
        seq.extend((j, r.cid, tuple(r.cv)) for r in cents.collect())
    assert fused == sorted(seq)
