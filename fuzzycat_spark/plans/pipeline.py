"""Resumable end-to-end dedup pipeline: every stage checkpoints to a named
parquet table with row counters and per-partition lineage, and a re-run
resumes from the last complete stage (north rule: "resumable from
checkpoint with per-partition lineage + metrics").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.operators.dedup import DedupConfig, dedup_stages
from fuzzycat_spark.plans.checkpoint import StageCheckpointer


def _lineage(stage_path: str) -> dict:
    """Per-partition row counts for a checkpointed stage, read from the
    parquet FOOTERS of the stage's part files — metadata only, zero Spark
    jobs (the round-2 version re-scanned every stage with a
    groupBy(spark_partition_id).count() after its write, doubling the
    action count of the whole pipeline). The part files ARE the stage's
    partitions (one per write task), so footer row counts are exactly the
    per-partition lineage record.

    Paths resolve through pyarrow.fs.FileSystem.from_uri, so both local
    directories and object-store URIs work (s3a:///s3n:// are mapped to
    pyarrow's s3://; footer reads there are ranged GETs). A filesystem
    pyarrow cannot reach degrades to an {"error": ...} record instead of
    failing the pipeline — lineage is telemetry, not a correctness
    dependency."""
    import os

    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    uri = stage_path
    for hadoop_scheme in ("s3a://", "s3n://"):
        if uri.startswith(hadoop_scheme):
            uri = "s3://" + uri[len(hadoop_scheme):]
            break
    try:
        filesystem, path = pafs.FileSystem.from_uri(uri)
        infos = filesystem.get_file_info(pafs.FileSelector(path))
        parts = sorted(
            i.path
            for i in infos
            if os.path.basename(i.path).startswith("part-")
            and i.path.endswith(".parquet")
        )
        per_part = {
            i: pq.ParquetFile(filesystem.open_input_file(p)).metadata.num_rows
            for i, p in enumerate(parts)
        }
    except Exception as exc:  # unreachable fs -> telemetry gap, not a crash
        return {"error": f"lineage unavailable for {stage_path}: {exc}"}
    return {
        "n_rows": int(sum(per_part.values())),
        "n_partitions": len(per_part),
        "rows_per_partition": per_part,
    }


def run_dedup_pipeline(
    pages: DataFrame,
    ck: StageCheckpointer,
    cfg: DedupConfig = DedupConfig(),
    lineage: bool = True,
) -> dict[str, DataFrame]:
    """Stage-checkpointed dedup: prepare → candidates (+ embedding tier) →
    verify → components → assignments. Re-running with the same
    checkpointer resumes after the last stage whose parquet table completed.

    The plan itself is `operators.dedup.dedup_stages` — the SAME composition
    `dedup_pages` (the flagship entry) runs: star edges for the key-equality
    strategies (so over-cap boilerplate mega-clusters still link, instead of
    the reference's drop-big-clusters behavior), per-pair priority dedup,
    the optional embedding cosine tier, and single-text-scan simhash via
    `with_token_hashes`. This path only swaps the ephemeral checkpoints for
    named resumable ones and records lineage/verdict counters.
    """

    def stage(name: str, build) -> DataFrame:
        df = ck.stage(name, build)
        if lineage:
            ck.record_counters(name, _lineage(ck.path(name)))
        return df

    out = dedup_stages(pages, cfg, stage, cc_checkpointer=ck)

    # the reference's run counters (notes/old_pipeline.md:106-112 analog)
    verdicts = {
        r["status"]: int(r["n"])
        for r in out["verified"]
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    ck.record_counters("verdicts", verdicts)
    return out
