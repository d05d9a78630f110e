"""Per-domain cap (`operators/domains.py`): exactness of the two-stage
salted top-k against a direct single-window computation, plus tie and
under-cap behavior."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fuzzycat_spark.operators.domains import domain_cap


def test_two_stage_matches_single_window(spark):
    # 3 domains x 40 docs with a deterministic pseudo-quality; salted
    # two-stage (salt=4 so every salt group is exercised) must equal the
    # naive global window exactly
    rows = [
        (i, f"dom{i % 3}", ((i * 37) % 100) / 100.0) for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, src string, q double")
    got = {
        (r.domain, r.rank): r.id
        for r in domain_cap(
            docs, "src", max_per_domain=5, quality_col="q", salt=4
        ).collect()
    }
    w = Window.partitionBy("src").orderBy(F.col("q").desc(), F.col("doc_id").asc())
    want = {
        (r.src, r.rn): r.doc_id
        for r in docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .collect()
    }
    assert got == want and len(got) == 15


def test_ties_break_on_min_id_and_under_cap_domains_survive(spark):
    docs = spark.createDataFrame(
        [(9, "a", 0.5), (3, "a", 0.5), (7, "a", 0.5), (1, "b", 0.1)],
        "doc_id long, src string, q double",
    )
    out = domain_cap(docs, "src", max_per_domain=2, quality_col="q", salt=2)
    got = sorted((r.domain, r.rank, r.id) for r in out.collect())
    assert got == [("a", 1, 3), ("a", 2, 7), ("b", 1, 1)]
