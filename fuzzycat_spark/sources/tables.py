"""Unified table I/O for the pipeline: Iceberg catalog tables on a
cluster, parquet/JSON-lines paths everywhere else.

The production corpus (the north rule's input shape) is an Iceberg table
of web pages `(url, warc_ts, html, text, lang)`. Iceberg needs nothing
from this package at runtime beyond session configuration — the catalog
is declared through public Spark conf keys and every read/write goes
through the stock DataFrame API (`spark.read.table`, `df.writeTo`), so
the SAME pipeline code runs against local parquet fixtures and a
1000-executor Iceberg warehouse. This module centralizes the two things
that differ:

- `iceberg_session_conf()` returns the documented conf keys that register
  an Iceberg catalog (pass them to `SparkSession.builder.config(map=...)`
  or `spark-submit --conf`). The jars ship with the cluster image
  (`--packages org.apache.iceberg:iceberg-spark-runtime-*`), not with us.
- `read_pages()` / `write_output()` route on the target's shape: a
  multipart identifier (`catalog.db.pages`) uses the catalog, a path uses
  the file format inferred from its suffix. Writing to an identifier uses
  the V2 `createOrReplace()` so Iceberg gets atomic snapshot commits —
  the property the per-stage lineage manifests (plans/checkpoint.py)
  assume when they record a stage as durably complete.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# public Iceberg-on-Spark conf (iceberg.apache.org/docs/latest/spark-configuration)
ICEBERG_CATALOG_IMPL = "org.apache.iceberg.spark.SparkCatalog"
ICEBERG_EXTENSIONS = (
    "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
)


def iceberg_session_conf(
    catalog: str,
    warehouse: str,
    catalog_type: str = "hadoop",
) -> dict[str, str]:
    """Spark conf map registering an Iceberg catalog named `catalog`
    backed by `warehouse` (an object-store or HDFS path for the hadoop
    catalog type; a metastore URI for hive; REST endpoints configure the
    same way with type=rest + uri). Apply at session build time."""
    base = f"spark.sql.catalog.{catalog}"
    return {
        "spark.sql.extensions": ICEBERG_EXTENSIONS,
        base: ICEBERG_CATALOG_IMPL,
        f"{base}.type": catalog_type,
        f"{base}.warehouse": warehouse,
    }


def is_table_identifier(source: str) -> bool:
    """Catalog identifiers have no path separator, no scheme, and no file
    suffix; everything else is a storage path."""
    if "/" in source or ":" in source:
        return False
    return not source.endswith((".parquet", ".json", ".jsonl", ".gz", ".zst"))


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Load the pages corpus from an Iceberg/catalog table identifier,
    a parquet directory, or JSON-lines files (.json/.jsonl, optionally
    .gz/.zst — Spark decompresses line-file codecs natively)."""
    if is_table_identifier(source):
        return spark.read.table(source)
    stripped = source.removesuffix(".gz").removesuffix(".zst")
    if stripped.endswith((".json", ".jsonl")):
        return spark.read.json(source)
    return spark.read.parquet(source)


def write_output(df: DataFrame, target: str, fmt: str = "iceberg") -> None:
    """Write a pipeline output. Table identifier -> V2 createOrReplace
    (atomic snapshot swap under Iceberg); path -> parquet overwrite."""
    if is_table_identifier(target):
        df.writeTo(target).using(fmt).createOrReplace()
    else:
        df.write.mode("overwrite").parquet(target)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a session-catalog parquet table hash-BUCKETED by
    `key` — the shuffle-amortization path for every artifact this
    pipeline joins repeatedly by the same key (the posting table joined
    per query batch, the reference band table joined per incoming crawl,
    the frozen reference corpus joined per candidate set): the bucket
    layout IS a persisted hash partitioning, so later equi-joins between
    tables bucketed the same way (same key, same `n_buckets`) run with
    ZERO Exchange on either side — the one-time write shuffle replaces a
    per-run shuffle of the big side forever. `sort=True` additionally
    sorts within buckets so those joins skip the sort of sort-merge too.

    Bucketed output requires the table catalog (`saveAsTable`; plain
    `.parquet(path)` cannot record bucket metadata) — point
    `spark.sql.warehouse.dir` somewhere durable. Iceberg's equivalent is
    a `bucket(N, key)` partition transform on the table DDL; this is the
    vanilla-Spark form of the same contract."""
    w = df.write.bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").mode(mode).saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a `write_bucketed` table with its bucket metadata live (the
    reader that makes the zero-Exchange join actually happen —
    `spark.read.parquet` on the underlying files would discard it)."""
    return spark.table(table)
