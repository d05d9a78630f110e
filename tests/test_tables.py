"""The table-I/O seam (sources/tables.py): identifier-vs-path routing,
the public Iceberg session conf, and round-trips through each local path
format. The Iceberg jars are cluster-side, so what is pinned here is
everything that runs in OUR code: routing, conf keys, format inference."""

from __future__ import annotations

import pytest

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
