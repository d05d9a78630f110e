"""The table-I/O seam (sources/tables.py): identifier-vs-path routing,
the public Iceberg session conf, and round-trips through each local path
format. The Iceberg jars are cluster-side, so what is pinned here is
everything that runs in OUR code: routing, conf keys, format inference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuzzycat_spark.sources.tables import (
    ICEBERG_CATALOG_IMPL,
    ICEBERG_EXTENSIONS,
    iceberg_session_conf,
    is_table_identifier,
    read_pages,
    write_output,
)


@pytest.mark.parametrize(
    ("source", "expect"),
    [
        ("warehouse.web.pages", True),
        ("pages", True),
        ("/data/pages.parquet", False),
        ("s3a://bucket/pages", False),
        ("pages.parquet", False),
        ("crawl.jsonl.zst", False),
        ("dump.json.gz", False),
    ],
)
def test_identifier_routing(source, expect):
    assert is_table_identifier(source) is expect


def test_iceberg_session_conf_keys():
    conf = iceberg_session_conf("lake", "s3a://warehouse/iceberg")
    assert conf["spark.sql.extensions"] == ICEBERG_EXTENSIONS
    assert conf["spark.sql.catalog.lake"] == ICEBERG_CATALOG_IMPL
    assert conf["spark.sql.catalog.lake.type"] == "hadoop"
    assert conf["spark.sql.catalog.lake.warehouse"] == "s3a://warehouse/iceberg"
    rest = iceberg_session_conf("r", "https://cat", catalog_type="rest")
    assert rest["spark.sql.catalog.r.type"] == "rest"


def test_read_pages_parquet_and_table(spark, tmp_path):
    df = spark.createDataFrame(
        [("u1", "alpha beta"), ("u2", "gamma delta")], ["url", "text"]
    )
    p = str(tmp_path / "pages.parquet")
    df.write.parquet(p)
    assert read_pages(spark, p).count() == 2
    # catalog-identifier route: read.table resolves temp views the same
    # way it resolves Iceberg identifiers on a configured session
    df.createOrReplaceTempView("tables_seam_pages")
    assert read_pages(spark, "tables_seam_pages").count() == 2
    spark.catalog.dropTempView("tables_seam_pages")


def test_read_pages_jsonl(spark, tmp_path):
    f = tmp_path / "crawl.jsonl"
    f.write_text('{"url": "u1", "text": "alpha"}\n{"url": "u2", "text": "beta"}\n')
    got = read_pages(spark, str(f))
    assert got.count() == 2 and set(got.columns) == {"url", "text"}


def test_write_output_path(spark, tmp_path):
    df = spark.createDataFrame([("a", 1)], ["id", "n"])
    out = str(tmp_path / "out")
    write_output(df, out)
    assert spark.read.parquet(out).count() == 1


def test_bucketed_join_has_zero_exchange(spark, tmp_path):
    """The point of write_bucketed: two tables bucketed by the same key
    join with NO Exchange on either side — the persisted bucket layout
    replaces the per-run shuffle; an unbucketed copy of the same data
    pays at least one."""
    from fuzzycat_spark.sources.tables import read_bucketed, write_bucketed

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("v")
    )
    scores = spark.range(500).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("s")
    )
    write_bucketed(docs, "bt_docs", "doc_id", n_buckets=8)
    write_bucketed(scores, "bt_scores", "doc_id", n_buckets=8)
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # gate-sized tables broadcast (bucketing is moot under BHJ); force the
    # sort-merge plan a 100 TB-by-100 TB join would take
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "bt_docs").join(
            read_bucketed(spark, "bt_scores"), "doc_id"
        )
        assert j.count() == 500
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan, plan

        # control: the same join off plain parquet needs an exchange
        p1, p2 = str(tmp_path / "d"), str(tmp_path / "s")
        docs.write.parquet(p1)
        scores.write.parquet(p2)
        cplan = (
            spark.read.parquet(p1)
            .join(spark.read.parquet(p2), "doc_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" in cplan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS bt_docs")
        spark.sql("DROP TABLE IF EXISTS bt_scores")
