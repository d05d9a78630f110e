"""Structured-streaming incremental dedup.

The reference is strictly batch and rebuilds from scratch per run
(`/root/reference/notes/2021_09_review.md:97-101`); its "online" path
(`simple.py:50-87`) verifies one probe at a time against an ES index. This
module is the Spark-native version of that incremental story:

- `streaming_exact_dedup`: readStream → watermarked dropDuplicates on the
  content hash — exact dups within the watermark horizon never reach the
  sink twice.
- `incremental_dedup_batch` (used via foreachBatch): each micro-batch is
  blocked/verified against BOTH itself and the accumulated band index
  (stream-static join), then appends its own band rows to the index —
  the grow-only index mirrors the reference's ES candidate store.

foreachBatch is the idiomatic pattern here because the per-batch logic
needs multi-output writes (pairs sink + index append), which pure
streaming operators cannot express.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.hashing import content_hash
from fuzzycat_spark.operators.dedup import DedupConfig, candidate_pairs
from fuzzycat_spark.operators.lsh import minhash_band_table
from fuzzycat_spark.operators.verify import prepare_pages, verify_pairs
from fuzzycat_spark.plans.checkpoint import materialize


def streaming_exact_dedup(
    stream: DataFrame,
    watermark_col: str = "warc_ts",
    watermark: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Exact-dup suppression on a streaming pages DataFrame.

    State is bounded by the watermark: a page is a duplicate if its content
    hash was seen within the horizon (dropDuplicatesWithinWatermark).
    """
    return (
        stream.withColumn("ch", content_hash(text_col))
        .withWatermark(watermark_col, watermark)
        .dropDuplicatesWithinWatermark(["ch"])
        .drop("ch")
    )


def incremental_dedup_batch(
    batch: DataFrame,
    index_path: str,
    pairs_path: str,
    cfg: DedupConfig = DedupConfig(),
) -> None:
    """foreachBatch body: verify `batch` against itself + the accumulated
    index, append verified pairs, then extend the index.

    The index table is (id, band_id, band_hash) — the LSH state. New-batch
    candidates = (new x new within batch) ∪ (new x indexed), exactly the
    reference's probe-vs-store search (`matching.py:20-181`) done as a
    stream-static join.
    """
    spark = batch.sparkSession
    batch = materialize(batch, None)
    prep = prepare_pages(batch, cfg.id_col, cfg.text_col)

    new_bands = materialize(
        minhash_band_table(
            prep, "id", cfg.text_col, cfg.num_perm, cfg.bands, cfg.rows,
            cfg.shingle_n, use_udf=cfg.minhash_udf, shingles_col="shingles",
        ),
        None,
    )

    # within-batch candidates (all strategies)
    cands = candidate_pairs(batch, cfg, prep=prep)

    # cross candidates: new batch vs historical index
    if os.path.exists(index_path):
        index = spark.read.parquet(index_path)
        cross = (
            new_bands.alias("n")
            .join(index.alias("o"), on=["band_id", "band_hash"])
            .select(
                F.least(F.col("n.id"), F.col("o.id")).alias("id_a"),
                F.greatest(F.col("n.id"), F.col("o.id")).alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        cands = cands.unionByName(cross).distinct()

    # features for ids on either side: batch features + historical features
    feat_path = index_path + "_features"
    new_feats = prep
    feats = new_feats
    if os.path.exists(feat_path):
        feats = feats.unionByName(spark.read.parquet(feat_path))

    verified = verify_pairs(cands, feats)
    verified.write.mode("append").parquet(pairs_path)

    new_bands.write.mode("append").parquet(index_path)
    new_feats.write.mode("append").parquet(feat_path)


def run_incremental_dedup(
    stream: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    cfg: DedupConfig = DedupConfig(),
):
    """Wire a streaming pages source into the incremental dedup sink.
    Returns the StreamingQuery (caller awaits/stops it)."""
    return (
        stream.writeStream.foreachBatch(
            lambda df, _epoch: incremental_dedup_batch(df, index_path, pairs_path, cfg)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
