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

State layout (all object-store-safe: existence = try-read, never
os.path):
- `<index>/`            band rows (id, band_id, band_hash), partitioned by
                        band_id so cross-joins prune partitions
- `<index>_features/`   per-id verify features (hashed forms only)
- `<index>_sizes/`      per-bucket cumulative counts — the hot-band guard:
                        buckets whose TOTAL size (history + this batch)
                        exceeds the cap are excluded from the cross join,
                        so a boilerplate band can never accumulate into a
                        quadratic per-batch join

foreachBatch is the idiomatic pattern here because the per-batch logic
needs multi-output writes (pairs sink + index/feature/size appends), which
pure streaming operators cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzycat_spark.functions.hashing import content_hash
from fuzzycat_spark.operators.dedup import DedupConfig, strategy_band_table
from fuzzycat_spark.operators.lsh import lsh_candidate_pairs
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


def try_read_parquet(spark: SparkSession, path: str) -> DataFrame | None:
    """Object-store-safe existence probe: attempt the read and treat an
    unreadable/absent path as no table. `os.path.exists` is wrong for
    s3a://-style URIs; the catalog/read attempt is the portable check."""
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def incremental_dedup_batch(
    batch: DataFrame,
    index_path: str,
    pairs_path: str,
    cfg: DedupConfig = DedupConfig(),
) -> None:
    """foreachBatch body: verify `batch` against itself + the accumulated
    index, append verified pairs, then extend the index.

    The index persists ALL strategy band rows (exact hash, slug key,
    MinHash bands), so cross-batch exact and slug dups link through the
    same stream-static join as LSH collisions — the reference's
    probe-vs-store search (`matching.py:20-181`) with one code path.

    Skew/size discipline per batch:
    - re-ingested ids are dropped before any work (idempotent re-delivery
      neither duplicates state nor re-verifies old pairs)
    - the hot-band guard uses CUMULATIVE bucket sizes (a tiny side table,
      one row per distinct bucket) rather than re-scanning the whole index
    - historical features are semi-joined down to the ids that actually
      collided before the verify join
    - superseded per-batch materializations are pruned (keep_last) so a
      long-running stream doesn't grow local disk without bound
    """
    spark = batch.sparkSession
    feat_path = index_path + "_features"
    sizes_path = index_path + "_sizes"

    batch = materialize(batch, "stream_batch", keep_last=2)
    prep = prepare_pages(batch, cfg.id_col, cfg.text_col)

    feat_hist = try_read_parquet(spark, feat_path)
    if feat_hist is not None:
        # idempotency guard: drop ids the index already carries
        prep = materialize(
            prep.join(feat_hist.select("id"), on="id", how="left_anti"),
            "stream_prep",
            keep_last=2,
        )

    new_bands = materialize(
        strategy_band_table(prep, cfg), "stream_bands", keep_last=2
    )
    # deterministic key-equality bands (exact hash, slug) link via star
    # edges — same O(n) no-cap design as the batch pipeline (see
    # operators/dedup.star_edges): each new member links to the band's
    # representative (the historical min id if the band was seen before,
    # else the batch-local min), so boilerplate mega-clusters stay fully
    # connected across batches without ever joining member x member.
    _KEY_BANDS = ("exact", "slug")
    # slug stars honor the cascade's length screen (short/empty docs fall
    # to ambiguous, never an edge) — drop their slug rows before they can
    # reach the index or a star (mirrors batch star_edges)
    from fuzzycat_spark.operators.verify import SHORT_TOKENS

    short_ids = prep.filter(F.col("n_tok") < SHORT_TOKENS).select("id")
    new_bands = new_bands.join(
        short_ids.withColumn("_short_slug", F.lit(True)),
        on="id",
        how="left",
    ).filter(
        ~((F.col("band_id") == "slug") & F.col("_short_slug").isNotNull())
    ).drop("_short_slug")
    new_key = new_bands.filter(F.col("band_id").isin(*_KEY_BANDS))
    new_near = new_bands.filter(~F.col("band_id").isin(*_KEY_BANDS))

    # cumulative per-bucket sizes: old + this batch's contribution
    new_sizes = new_bands.groupBy("band_id", "band_hash", "cap").agg(
        F.count(F.lit(1)).alias("n")
    )
    old_sizes = try_read_parquet(spark, sizes_path)
    if old_sizes is not None:
        new_sizes = (
            new_sizes.unionByName(old_sizes)
            .groupBy("band_id", "band_hash", "cap")
            .agg(F.sum("n").alias("n"))
        )
    sizes = materialize(new_sizes, "stream_sizes", keep_last=2)
    hot = sizes.filter(F.col("n") > F.col("cap")).select("band_id", "band_hash")

    # within-batch candidates for APPROXIMATE bands only (single-shuffle
    # capped pair expansion); key bands link through stars below
    cands = lsh_candidate_pairs(new_near, max_bucket_size="cap")

    # star edges for the key bands: rep = historical min id for the band
    # if present, else the batch-local min
    index = try_read_parquet(spark, index_path)
    from pyspark.sql.window import Window

    wb = Window.partitionBy("band_id", "band_hash")
    key_m = new_key.withColumn("_newrep", F.min("id").over(wb))
    if index is not None:
        hist_reps = (
            index.filter(F.col("band_id").isin(*_KEY_BANDS))
            .groupBy("band_id", "band_hash")
            .agg(F.min("id").alias("_histrep"))
        )
        key_m = key_m.join(hist_reps, on=["band_id", "band_hash"], how="left")
    else:
        key_m = key_m.withColumn("_histrep", F.lit(None).cast("string"))
    star_pairs = (
        key_m.withColumn("_rep", F.coalesce("_histrep", "_newrep"))
        .filter(F.col("id") != F.col("_rep"))
        .select(
            F.least("_rep", "id").alias("id_a"),
            F.greatest("_rep", "id").alias("id_b"),
            F.when(F.col("band_id") == "exact", F.lit("CONTENT_HASH"))
            .otherwise(F.lit("SLUG_MATCH"))
            .alias("reason"),
        )
        .withColumn(
            "_prio", F.when(F.col("reason") == "CONTENT_HASH", 0).otherwise(1)
        )
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("id_a", "id_b").orderBy("_prio")
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("id_a", "id_b", F.lit("exact").alias("status"), "reason")
    )

    # cross candidates for approximate bands: new batch vs historical
    # index, hot bands excluded on BOTH sides by cumulative size (the
    # within-batch cap alone would let a band that grew hot across
    # batches join quadratically)
    if index is not None:
        cool_new = new_near.join(hot, on=["band_id", "band_hash"], how="left_anti")
        cool_old = index.filter(~F.col("band_id").isin(*_KEY_BANDS)).join(
            hot, on=["band_id", "band_hash"], how="left_anti"
        )
        cross = (
            cool_new.alias("n")
            .join(cool_old.alias("o"), on=["band_id", "band_hash"])
            .select(
                F.least(F.col("n.id"), F.col("o.id")).alias("id_a"),
                F.greatest(F.col("n.id"), F.col("o.id")).alias("id_b"),
            )
            .filter(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        cands = cands.unionByName(cross).distinct()

    cands = materialize(cands, "stream_cands", keep_last=2)

    # features: this batch's + ONLY the historical rows that collided
    feats = prep
    if feat_hist is not None:
        hit_ids = (
            cands.select(F.col("id_a").alias("id"))
            .unionByName(cands.select(F.col("id_b").alias("id")))
            .distinct()
        )
        feats = feats.unionByName(
            feat_hist.join(hit_ids, on="id", how="left_semi")
        )

    # star-linked pairs bypass the cascade (key equality IS the verdict);
    # drop them from the candidate set so a pair is emitted once
    cands = cands.join(
        star_pairs.select("id_a", "id_b"), on=["id_a", "id_b"], how="left_anti"
    )
    verified = verify_pairs(cands, feats)
    verified.unionByName(star_pairs).write.mode("append").parquet(pairs_path)

    # state appends last, after the pairs are durable; band rows partition
    # by band_id so future cross joins prune to colliding strategies/bands
    new_bands.select("id", "band_id", "band_hash").write.partitionBy(
        "band_id"
    ).mode("append").parquet(index_path)
    prep.write.mode("append").parquet(feat_path)
    # sizes is cumulative (not append); its source is the ephemeral
    # materialization above, so overwriting the live path never reads the
    # files it is deleting
    sizes.write.mode("overwrite").parquet(sizes_path)


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
