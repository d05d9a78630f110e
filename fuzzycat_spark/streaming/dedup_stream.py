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

Strategy scope: every band strategy the batch pipeline supports — exact,
slug, minhash, simhash, winnow, nysiis, and embedding with the
DETERMINISTIC hyperplane index (seeded planes hash identically across
epochs, so historical buckets stay joinable) — plus substring containment
via a per-epoch k-gram index (below). embedding_index="ivf" is refused
loudly: per-batch k-means centroids are not stable across epochs, so IVF
cell ids written in epoch N would be meaningless against epoch N+1's
(batch users get IVF; streams use hyperplane). A stream's DedupConfig
must not change over its lifetime — the embedding column in particular is
persisted into the feature state, and enabling it mid-stream fails loudly.

State layout (all object-store-safe: existence = try-read, never
os.path):
- `<index>/epoch=N/`          band rows (id, band_id, band_hash),
                              sub-partitioned by band_id so cross-joins
                              prune partitions
- `<index>_features/epoch=N/` per-id verify features (hashed forms only;
                              plus the embedding vector when the embedding
                              strategy is enabled — the cosine tier needs
                              historical vectors)
- `<index>_ssgrams/epoch=N/`  substring k-gram index rows (id, gh int64) —
                              the distributed suffix-array analog, epoch-
                              partitioned like the band index
- `<index>_ssmeta/epoch=N/`   substring probe rows (id, gh0, slug): the
                              first-window hash plus the normalized slug
                              for the exact containment confirmation (the
                              one state table holding strings — the same
                              price the batch operator pays when it joins
                              slugs back for surviving candidates)
- `<index>_sizes/epoch=N/`    cumulative per-bucket counts SNAPSHOT — the
                              hot-band guard: buckets whose TOTAL size
                              (history + this batch) exceeds the cap are
                              excluded from the cross join
- `<pairs>/epoch=N/`          the verified-pair sink
- `<index>_sizes/_CURRENT`    the commit pointer: the highest epoch whose
                              writes ALL completed

Crash atomicity: every state table is written per-epoch with overwrite
semantics and the pointer is swapped LAST (a single small-file rename
locally, a single PUT on an object store). foreachBatch re-runs a failed
epoch under the SAME epoch id, so a replay overwrites the partial
epoch=N dirs in place and only then commits the pointer — reads filter
to epochs <= pointer, so a kill between any two writes can neither lose
the cumulative hot-band state (the round-2 in-place sizes overwrite
could) nor double-append pairs/index/feature rows.

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


def _pointer_path(sizes_path: str) -> str:
    return sizes_path + "/_CURRENT"


def _resolve_fs(path: str):
    """(filesystem, fs_path) — shared scheme-mapping helper, see
    plans.checkpoint.resolve_fs."""
    from fuzzycat_spark.plans.checkpoint import resolve_fs

    return resolve_fs(path)


def committed_epoch(index_path: str) -> int | None:
    """Highest epoch whose state writes all completed (None = no commits).
    One read of one small key, resolved through pyarrow.fs so s3a://-style
    index paths work, not just local directories."""
    try:
        fs, p = _resolve_fs(_pointer_path(index_path + "_sizes"))
        with fs.open_input_stream(p) as f:
            return int(f.read().decode("utf-8").strip())
    except (OSError, ValueError, FileNotFoundError):
        return None


def _commit_pointer(index_path: str, epoch: int) -> None:
    """Swap the commit pointer — the LAST write of an epoch (atomic
    visibility via plans.checkpoint.atomic_put: local rename / single
    object-store PUT)."""
    from fuzzycat_spark.plans.checkpoint import atomic_put

    atomic_put(_pointer_path(index_path + "_sizes"), str(epoch))


def _read_state(
    spark: SparkSession, parent: str, upto_epoch: int | None
) -> DataFrame | None:
    """Read a per-epoch state table, keeping only COMMITTED epochs (a
    crashed attempt's epoch dir is present but not pointed to).

    Compaction-aware (streaming/compaction.py): if the table carries a
    base pointer, the view is base(gen) ∪ epochs in (base_upto, committed]
    — one compacted table plus the short post-compaction tail, instead of
    a union over every epoch directory the stream has ever written. The
    `_base` subdirectory is underscore-prefixed, so the tail's partition
    discovery never sees it."""
    if upto_epoch is None:
        return None
    from fuzzycat_spark.streaming.compaction import base_pointer

    ptr = base_pointer(parent)
    tail = try_read_parquet(spark, parent)
    if ptr is None:
        if tail is None:
            return None
        return tail.filter(F.col("epoch") <= upto_epoch).drop("epoch")
    gen, base_upto = ptr
    base = try_read_parquet(spark, f"{parent}/_base/gen={gen}")
    if tail is not None:
        tail = tail.filter(
            (F.col("epoch") > base_upto) & (F.col("epoch") <= upto_epoch)
        ).drop("epoch")
    if base is None:
        # A base pointer without a readable gen dir means compacted
        # history is GONE (partial copy of the state tree, manual
        # cleanup, object-store listing failure) — serving just the
        # tail would make the idempotency guard re-index every
        # historical doc and silently corrupt cumulative state. Same
        # fail-loudly policy as the fresh-checkpoint replay guard.
        raise RuntimeError(
            f"state table {parent} has base pointer gen={gen} "
            f"(upto epoch {base_upto}) but _base/gen={gen} is unreadable; "
            "refusing to serve a truncated view"
        )
    return base if tail is None else base.unionByName(tail)


def read_pairs(spark: SparkSession, pairs_path: str, index_path: str) -> DataFrame | None:
    """The consumer-facing read of the pairs sink: committed epochs only."""
    return _read_state(spark, pairs_path, committed_epoch(index_path))


def incremental_dedup_batch(
    batch: DataFrame,
    index_path: str,
    pairs_path: str,
    cfg: DedupConfig = DedupConfig(),
    epoch_id: int | None = None,
    assign: bool = True,
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
    committed = committed_epoch(index_path)
    if epoch_id is None:
        # direct (non-foreachBatch) callers: next epoch after the commit
        epoch_id = 0 if committed is None else committed + 1
    elif committed is not None and epoch_id <= committed:
        # foreachBatch is at-least-once: a crash AFTER _commit_pointer(N)
        # but BEFORE Spark records batch N in the streaming checkpoint
        # replays epoch N with committed == N. Re-running it would be
        # catastrophic, not merely wasteful: the idempotency guard below
        # drops every id (their features are already in epoch <= committed),
        # so the per-epoch overwrite writes would REPLACE pairs/index/
        # features epoch=N with empty tables. The pointer swap is the LAST
        # write of an epoch, so committed == N proves epoch N is fully
        # durable — skip the replay.
        #
        # The skip is only safe when the replayed batch is the SAME data,
        # which a true at-least-once replay guarantees. The other way to
        # land here is a FRESH checkpoint_dir pointed at existing index/
        # pairs paths: foreachBatch restarts epoch ids at 0, and batch 0
        # of the new stream may contain NEW source files — silently
        # skipping those would lose them forever (the new streaming
        # checkpoint marks them consumed). Distinguish the two cases by
        # probing for ids absent from the committed feature state: a true
        # replay has none; a fresh-restart batch with new data does, and
        # must fail loudly so the operator re-runs with either the
        # original checkpoint_dir or fresh state paths.
        import logging

        logging.getLogger(__name__).warning(
            "incremental_dedup_batch: skipping epoch %d (already committed "
            "through epoch %d) — verifying the skipped batch carries no "
            "unseen ids",
            epoch_id,
            committed,
        )
        feat_hist = _read_state(spark, feat_path, committed)
        ids = batch.select(F.col(cfg.id_col).alias("id"))
        unseen = (
            ids if feat_hist is None
            else ids.join(feat_hist.select("id"), on="id", how="left_anti")
        ).limit(1).count()
        if unseen:
            raise RuntimeError(
                f"incremental_dedup_batch: epoch {epoch_id} <= committed "
                f"epoch {committed} but the batch contains ids absent from "
                "the committed state. This means a NEW checkpoint_dir was "
                "started against EXISTING index/pairs paths, which is "
                "unsupported (epoch ids restart at 0 and committed epochs "
                "are skipped as replays — new data in them would be lost). "
                "Restore the original checkpoint_dir, or point the stream "
                "at fresh index_path/pairs_path state."
            )
        return

    emb_enabled = "embedding" in cfg.strategies
    if emb_enabled and cfg.embedding_index != "hyperplane":
        raise ValueError(
            "incremental dedup supports embedding_index='hyperplane' only: "
            "seeded hyperplanes hash identically across epochs, but IVF "
            "centroids are fit per batch, so cell ids written in one epoch "
            "would not match the next epoch's — the grow-only index would "
            "silently stop linking cross-batch embedding dups. Use "
            "hyperplane for streams (IVF stays a batch-pipeline index)."
        )
    batch = materialize(batch, "stream_batch", keep_last=2)
    feat_hist = _read_state(spark, feat_path, committed)
    if feat_hist is not None:
        # idempotency guard: drop ids the index already carries BEFORE any
        # feature/band/gram work — every strategy below sees only new docs
        batch = materialize(
            batch.join(
                feat_hist.select(F.col("id").alias(cfg.id_col)),
                on=cfg.id_col,
                how="left_anti",
            ),
            "stream_batch_new",
            keep_last=2,
        )
    prep = prepare_pages(
        batch, cfg.id_col, cfg.text_col, slug_mode=cfg.slug_mode,
        with_token_hashes="simhash" in cfg.strategies,
    )
    if emb_enabled:
        if cfg.embedding_col is None or cfg.embedding_dim is None:
            raise ValueError(
                "embedding strategy needs cfg.embedding_col and cfg.embedding_dim"
            )
        if feat_hist is not None and "_emb" not in feat_hist.columns:
            raise ValueError(
                "the committed feature state carries no embedding column: "
                "this stream's earlier epochs ran WITHOUT the embedding "
                "strategy. A stream's DedupConfig must not change over its "
                "lifetime — start fresh state paths to enable embeddings."
            )
        # persist the vector alongside the hashed features: the cosine
        # tier must score candidates against HISTORICAL docs' embeddings
        prep = materialize(
            prep.join(
                batch.select(
                    F.col(cfg.id_col).alias("id"),
                    F.col(cfg.embedding_col).alias("_emb"),
                ),
                on="id",
                how="left",
            ),
            "stream_prep_emb",
            keep_last=2,
        )

    band_strategies = tuple(s for s in cfg.strategies if s != "substring")
    if band_strategies:
        from dataclasses import replace

        new_bands = materialize(
            strategy_band_table(
                prep, replace(cfg, strategies=band_strategies), pages=batch
            ),
            "stream_bands",
            keep_last=2,
        )
    else:
        # substring-only config: no band strategies, empty band table with
        # the right schema so the shared sizes/star/cross plumbing is a no-op
        new_bands = prep.select(
            "id",
            F.lit("x").alias("band_id"),
            F.lit("x").alias("band_hash"),
            F.lit(0).alias("cap"),
        ).limit(0)
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

    ss = None
    if "substring" in cfg.strategies:
        # substring containment state: the per-doc k-gram rows (index
        # side) and (first-window hash, slug) probes — the SAME quantities
        # the batch operator derives, persisted per epoch so containment
        # links across batches in both directions (new-in-old via
        # new-probe x old-index, old-in-new via old-probe x new-index)
        from fuzzycat_spark.operators.substring import substring_doc_grams

        gdoc = materialize(
            substring_doc_grams(
                batch, cfg.id_col, cfg.text_col, k=cfg.substring_k,
                slug_mode=cfg.slug_mode,
            ),
            "stream_ssdoc",
            keep_last=2,
        )
        ss = (
            gdoc.select("id", F.explode("grams").alias("gh")),
            gdoc.select("id", "gh0", "slug"),
        )

    # cumulative per-bucket sizes: old + this batch's contribution
    new_sizes = new_bands.groupBy("band_id", "band_hash", "cap").agg(
        F.count(F.lit(1)).alias("n")
    )
    if ss is not None:
        # substring gram buckets ride the same cumulative-size/hot-guard
        # machinery under the reserved 'ssgram' band id (they are NEVER
        # pair-expanded like bands — only probe-joined below)
        new_sizes = new_sizes.unionByName(
            ss[0]
            .groupBy("gh")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.lit("ssgram").alias("band_id"),
                F.col("gh").cast("string").alias("band_hash"),
                F.lit(cfg.max_bucket_size).alias("cap"),
                "n",
            )
        )
    old_sizes = (
        try_read_parquet(spark, f"{sizes_path}/epoch={committed}")
        if committed is not None
        else None
    )
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
    index = _read_state(spark, index_path, committed)
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

    if ss is not None:
        # substring containment candidates: probe (first k-gram) joins the
        # gram index, hot gram buckets excluded by CUMULATIVE size on both
        # sides (in batch only the index side is capped, but a probe whose
        # bucket is hot finds zero index rows there — excluding the probe
        # is the same result, fewer shuffled rows). hist x hist never
        # joins, so a pair is emitted exactly once: the epoch its newer
        # member arrives.
        new_grams, new_meta = ss
        hot_gh = hot.filter(F.col("band_id") == "ssgram").select(
            F.col("band_hash").cast("long").alias("gh")
        )
        hist_grams = _read_state(spark, index_path + "_ssgrams", committed)
        hist_meta = _read_state(spark, index_path + "_ssmeta", committed)
        cool_new_grams = new_grams.join(hot_gh, on="gh", how="left_anti")
        index_side = cool_new_grams
        if hist_grams is not None:
            index_side = index_side.unionByName(
                hist_grams.join(hot_gh, on="gh", how="left_anti")
            )
        probe_new = new_meta.select("id", F.col("gh0").alias("gh")).join(
            hot_gh, on="gh", how="left_anti"
        )
        sspairs = (
            probe_new.select(F.col("id").alias("id_in"), "gh")
            .join(index_side.select(F.col("id").alias("id_of"), "gh"), on="gh")
            .select("id_in", "id_of")
        )
        if hist_meta is not None:
            probe_hist = hist_meta.select("id", F.col("gh0").alias("gh")).join(
                hot_gh, on="gh", how="left_anti"
            )
            sspairs = sspairs.unionByName(
                probe_hist.select(F.col("id").alias("id_in"), "gh")
                .join(
                    cool_new_grams.select(F.col("id").alias("id_of"), "gh"),
                    on="gh",
                )
                .select("id_in", "id_of")
            )
        sspairs = sspairs.filter(F.col("id_in") != F.col("id_of")).distinct()
        # exact confirmation over the persisted slugs (kills k-gram hash
        # collisions and shared-prefix-only overlaps, exactly like batch)
        slugs = new_meta.select("id", "slug")
        if hist_meta is not None:
            slugs = slugs.unionByName(hist_meta.select("id", "slug"))
        confirmed = (
            sspairs.join(
                slugs.select(F.col("id").alias("id_in"), F.col("slug").alias("_s_in")),
                on="id_in",
            )
            .join(
                slugs.select(F.col("id").alias("id_of"), F.col("slug").alias("_s_of")),
                on="id_of",
            )
            .filter(F.instr(F.col("_s_of"), F.col("_s_in")) > 0)
            .select(
                F.least(F.col("id_in"), F.col("id_of")).alias("id_a"),
                F.greatest(F.col("id_in"), F.col("id_of")).alias("id_b"),
            )
        )
        cands = cands.unionByName(confirmed).distinct()

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
    from fuzzycat_spark.operators.dedup import _deny

    if emb_enabled:
        # embedding cosine tier BEFORE the text cascade, mirroring the
        # batch plan (dedup_stages): paraphrase dups have dissimilar text
        # by definition, so cosine >= embedding_strong is the verdict and
        # only the remainder pays the text joins. feats carries _emb for
        # both this batch's and the colliding historical docs.
        from fuzzycat_spark.operators.knn import cosine_col

        embs = feats.select("id", "_emb")
        scored = (
            cands.join(
                embs.select(F.col("id").alias("id_a"), F.col("_emb").alias("_ea")),
                on="id_a",
            )
            .join(
                embs.select(F.col("id").alias("id_b"), F.col("_emb").alias("_eb")),
                on="id_b",
            )
            .select(
                "id_a",
                "id_b",
                F.round(cosine_col(F.col("_ea"), F.col("_eb")), 9).alias("_cos"),
            )
        )
        emb_pairs = materialize(
            scored.filter(F.col("_cos") >= cfg.embedding_strong).select(
                "id_a",
                "id_b",
                F.lit("strong").alias("status"),
                F.lit("EMBEDDING_COSINE").alias("reason"),
            ),
            "stream_emb_pairs",
            keep_last=2,
        )
        rest = cands.join(
            emb_pairs.select("id_a", "id_b"), on=["id_a", "id_b"], how="left_anti"
        )
        verified = verify_pairs(rest, feats, denylist_keys=_deny(cfg)).unionByName(
            emb_pairs
        )
    else:
        verified = verify_pairs(cands, feats, denylist_keys=_deny(cfg))
    # every write below is per-epoch + overwrite (idempotent under replay
    # of the same epoch); the pointer swap LAST makes the epoch atomic —
    # a kill between any two writes leaves the pointer at the previous
    # epoch, and the replay overwrites the partial dirs
    verified.unionByName(star_pairs).write.mode("overwrite").parquet(
        f"{pairs_path}/epoch={epoch_id}"
    )
    if assign:
        # incremental cluster assignments (streaming/assignments.py):
        # fold this epoch's written pairs into the label state — reads
        # the just-written sink (materialized; re-deriving the lazy plan
        # would re-run blocking+verify), writes labels/remap BEFORE the
        # pointer swap so assignments commit atomically with the epoch
        from fuzzycat_spark.streaming.assignments import update_assignments

        update_assignments(
            spark,
            spark.read.parquet(f"{pairs_path}/epoch={epoch_id}"),
            prep.select("id"),
            index_path,
            epoch_id,
            committed,
            edge_statuses=cfg.edge_statuses,
        )
    new_bands.select("id", "band_id", "band_hash").write.partitionBy(
        "band_id"
    ).mode("overwrite").parquet(f"{index_path}/epoch={epoch_id}")
    prep.write.mode("overwrite").parquet(f"{feat_path}/epoch={epoch_id}")
    sizes.write.mode("overwrite").parquet(f"{sizes_path}/epoch={epoch_id}")
    extra_tables: tuple[tuple[str, str], ...] = ()
    if ss is not None:
        ss[0].write.mode("overwrite").parquet(
            f"{index_path}_ssgrams/epoch={epoch_id}"
        )
        ss[1].write.mode("overwrite").parquet(
            f"{index_path}_ssmeta/epoch={epoch_id}"
        )
        extra_tables = (
            ("ssgrams", index_path + "_ssgrams"),
            ("ssmeta", index_path + "_ssmeta"),
        )
    if assign:
        extra_tables = extra_tables + (
            ("labels", index_path + "_labels"),
            ("remap", index_path + "_remap"),
        )
    _write_epoch_manifest(index_path, pairs_path, epoch_id, extra_tables)
    _commit_pointer(index_path, epoch_id)


def _write_epoch_manifest(
    index_path: str,
    pairs_path: str,
    epoch_id: int,
    extra_tables: tuple[tuple[str, str], ...] = (),
) -> None:
    """Per-epoch lineage record (north rule: "per-partition lineage +
    metrics" for EVERY stage, streaming included): parquet-footer row
    counts per partition for each state table of the epoch — metadata
    reads only, zero Spark jobs, same mechanism as the batch pipeline's
    stage lineage (plans/checkpoint.partition_lineage). Written BEFORE the
    pointer swap so a committed epoch always has its manifest; failures
    degrade to an error record, never block the commit."""
    import json

    from fuzzycat_spark.plans.checkpoint import partition_lineage

    manifest = {
        "epoch": epoch_id,
        "tables": {
            name: partition_lineage(f"{parent}/epoch={epoch_id}")
            for name, parent in (
                ("pairs", pairs_path),
                ("features", index_path + "_features"),
                ("sizes", index_path + "_sizes"),
                *extra_tables,
            )
        },
    }
    try:
        fs, p = _resolve_fs(
            f"{index_path}_sizes/_manifest_epoch_{epoch_id}.json"
        )
        with fs.open_output_stream(p) as f:
            f.write(json.dumps(manifest, indent=1).encode("utf-8"))
    except Exception:
        pass  # lineage is telemetry — never fail the epoch over it


def read_epoch_manifest(index_path: str, epoch_id: int) -> dict | None:
    """Load one epoch's lineage manifest (None if absent/unreadable)."""
    import json

    try:
        fs, p = _resolve_fs(
            f"{index_path}_sizes/_manifest_epoch_{epoch_id}.json"
        )
        with fs.open_input_stream(p) as f:
            return json.loads(f.read().decode("utf-8"))
    except Exception:
        return None


def run_incremental_dedup(
    stream: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    cfg: DedupConfig = DedupConfig(),
    assign: bool = True,
):
    """Wire a streaming pages source into the incremental dedup sink.
    Returns the StreamingQuery (caller awaits/stops it). `assign=True`
    additionally maintains incremental cluster assignments (the batch
    pipeline's end product) — see streaming/assignments.py."""
    return (
        stream.writeStream.foreachBatch(
            lambda df, epoch: incremental_dedup_batch(
                df, index_path, pairs_path, cfg, epoch_id=epoch, assign=assign
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
