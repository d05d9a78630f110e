"""Training-shard emission: the step after dedup + mixing that turns a
kept corpus into N reproducibly-shuffled shards for sequential training
readers.

Reference analog: fuzzycat ends at sorted cluster slabs on one machine
(notes/old_pipeline.md's GNU-sort output); a training pipeline instead
needs the corpus *unsorted* — an order decorrelated from crawl/domain
locality — split into equal files.

Scale design:
- Shard id and within-shard order are pure hashes of (id, seed) — the
  same discipline as operators/mixing.py: no RNG state, no global sort,
  no `orderBy(rand())` (whose sample-based range partitioner is neither
  stable under retries nor cheap at 100 TB). Re-running any subset of
  tasks reproduces the same placement, and the assignment is a property
  of the ROW, not of the partitioning it arrived in.
- Two independent 48-bit fields of one md5 supply shard and order — one
  hash computation per row, both fields reproducible in DuckDB for the
  oracle.
- Materializing the shard layout costs exactly ONE shuffle (by shard id);
  within-shard order is a sort-within-partition, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fuzzycat_spark.functions.hashing import md5_field48


def shard_columns(
    id_col: str | Column, n_shards: int, seed: int = 0
) -> tuple[Column, Column]:
    """(shard, order_key): shard uniform over [0, n_shards) from the md5
    low field, order_key the independent high field — the reproducible
    global shuffle."""
    return (
        (md5_field48(id_col, seed, 1) % n_shards).cast("int"),
        md5_field48(id_col, seed, 13),
    )


def shard_table(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """`df` + (shard, shard_pos): shard_pos is the row's 0-based position
    in its shard's deterministic order (order_key, then id for total
    order). One shuffle — the row_number window partitions by shard."""
    shard, order_key = shard_columns(id_col, n_shards, seed)
    out = df.withColumn("shard", shard).withColumn("_order_key", order_key)
    w = Window.partitionBy("shard").orderBy("_order_key", id_col)
    return (
        out.withColumn("shard_pos", F.row_number().over(w) - F.lit(1))
        .drop("_order_key")
    )


def pack_shard_sequences(
    docs: DataFrame,
    seq_len: int,
    n_shards: int,
    id_col: str = "doc_id",
    count_col: str | None = None,
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Concatenate-and-chunk sequence packing: each shard's documents,
    in the reproducible shard order, form one token stream split into
    fixed `seq_len` training sequences (documents may straddle a
    boundary, GPT-style packing — no padding, no waste).

    Per document: (shard, shard_pos, n_tokens, start_off, start_seq,
    end_seq) where start_off is the document's first-token offset in
    its shard's stream and start_seq/end_seq = the sequence indices of
    its first/last token (both NULL for empty documents, which occupy
    no slot). Token counts come from `count_col` when given, else from
    whitespace-tokenizing `text_col` (`spans.raw_tokens`).

    Scale shape: ONE shuffle — the per-shard window; the running offset
    is a cumulative sum over rows already sorted by the shard_pos
    window, so Catalyst reuses the exchange. No global sort, no
    driver-side packing loop; placement is a pure function of
    (id, seed) so retries and re-runs reproduce the same layout."""
    if count_col is None:
        from fuzzycat_spark.operators.spans import raw_tokens

        n = F.size(raw_tokens(text_col)).cast("long")
    else:
        n = F.col(count_col).cast("long")
    st = shard_table(
        docs.select(F.col(id_col), n.alias("n_tokens")),
        n_shards,
        id_col=id_col,
        seed=seed,
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("shard_pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    nt = F.col("n_tokens")
    return st.select(
        id_col,
        "shard",
        "shard_pos",
        "n_tokens",
        start.alias("start_off"),
        F.when(nt > 0, F.floor(start / seq_len)).alias("start_seq"),
        F.when(nt > 0, F.floor((start + nt - 1) / seq_len)).alias("end_seq"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> None:
    """Write `<path>/shard=K/` parquet, rows inside each shard in the
    deterministic shuffled order. One repartition(n_shards, shard) — the
    sort is within-partition only. (Integer-hash partitioning may co-host
    two shards in one task; partitionBy still splits the files per shard,
    so layout is exact and only task balance is approximate.)"""
    shard, order_key = shard_columns(id_col, n_shards, seed)
    (
        df.withColumn("shard", shard)
        .withColumn("_order_key", order_key)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "_order_key", id_col)
        .drop("_order_key")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def export_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    compression: str = "gzip",
    extra_cols: tuple[str, ...] = (),
) -> None:
    """Write `<path>/shard=K/` compressed JSONL — the loader-facing twin
    of `write_training_shards` (training readers and tokenizer pipelines
    stream line-delimited JSON, not parquet). Same reproducible layout:
    shard and within-shard order are the two 48-bit md5 fields, so the
    parquet shards, the packing layout (`pack_shard_sequences`) and this
    export all agree row-for-row on placement AND order.

    Scale shape: ONE shuffle (repartition by shard id), sort within
    partition only. Each shard's rows land in exactly one task (integer
    hash of the shard id), and `partitionBy` splits co-hosted shards into
    their own directories — so every `shard=K/` holds exactly ONE file
    whose bytes are a pure function of (rows, seed): rerunning the export
    reproduces identical files, which is what makes shard md5s usable as
    a transfer/integrity manifest at 10^12 docs. Compression defaults to
    gzip (the one codec every downstream JSONL reader speaks; this
    Spark's text writer has no zstd codec — parquet artifacts keep zstd).
    Per-file gzip is stream-decodable; shards are the parallelism unit,
    so non-splittable compressed files cost nothing here.
    """
    shard, order_key = shard_columns(id_col, n_shards, seed)
    cols = [id_col, text_col, *extra_cols]
    (
        df.withColumn("shard", shard)
        .withColumn("_order_key", order_key)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "_order_key", id_col)
        .select(
            F.to_json(F.struct(*[F.col(c) for c in cols])).alias("value"),
            "shard",
        )
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", compression)
        .text(path)
    )


def jsonl_shard_manifest(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> DataFrame:
    """Per-shard integrity manifest for `export_jsonl_shards`: (shard,
    n_docs, n_chars, content_h). content_h is the bit_xor of a 48-bit
    md5 over (id, 0x01, text) — order-free, so it is identical however
    tasks reduce it, and engine-portable (the oracle recomputes it in
    DuckDB). One partial-aggregated shuffle of n_shards groups; the
    text never moves (hash + length are computed inside the scan).
    Receivers verify a shard by recomputing the xor over the lines they
    decoded — any dropped/duplicated/corrupted row flips it."""
    shard, _ = shard_columns(id_col, n_shards, seed)
    row_h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col(id_col).cast("string"),
                    F.lit("\x01"),
                    F.col(text_col),
                ).cast("binary")
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    return (
        df.select(
            shard.alias("shard"),
            F.length(text_col).cast("long").alias("_nc"),
            row_h.alias("_h"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_nc").cast("long").alias("n_chars"),
            F.bit_xor("_h").alias("content_h"),
        )
    )
