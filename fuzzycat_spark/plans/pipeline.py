"""Resumable end-to-end dedup pipeline: every stage checkpoints to a named
parquet table with row counters and per-partition lineage, and a re-run
resumes from the last complete stage (north rule: "resumable from
checkpoint with per-partition lineage + metrics").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.operators.components import connected_components
from fuzzycat_spark.operators.dedup import DedupConfig, candidate_pairs
from fuzzycat_spark.operators.verify import prepare_pages, verify_pairs
from fuzzycat_spark.plans.checkpoint import StageCheckpointer


def _lineage(df: DataFrame) -> dict:
    """Per-partition row counts — the lineage record each stage carries."""
    rows = (
        df.groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .orderBy("pid")
        .collect()
    )
    return {
        "n_rows": int(sum(r["count"] for r in rows)),
        "n_partitions": len(rows),
        "rows_per_partition": {int(r["pid"]): int(r["count"]) for r in rows},
    }


def run_dedup_pipeline(
    pages: DataFrame,
    ck: StageCheckpointer,
    cfg: DedupConfig = DedupConfig(),
    lineage: bool = True,
) -> dict[str, DataFrame]:
    """Stage-checkpointed dedup: prepare → candidates → verify → components
    → assignments. Re-running with the same checkpointer resumes after the
    last stage whose parquet table completed.
    """

    def record(name: str, df: DataFrame) -> DataFrame:
        if lineage:
            ck.record_counters(name, _lineage(df))
        return df

    prep = record("prepared", ck.stage("prepared", lambda: prepare_pages(pages, cfg.id_col, cfg.text_col)))
    cands = record("candidates", ck.stage("candidates", lambda: candidate_pairs(pages, cfg, prep=prep)))
    verified = record("verified", ck.stage("verified", lambda: verify_pairs(cands, prep)))

    def build_assignments() -> DataFrame:
        edges = verified.filter(F.col("status").isin(*cfg.edge_statuses))
        cc = connected_components(edges, checkpointer=ck)
        return (
            pages.select(F.col(cfg.id_col).alias("id"))
            .join(cc, on="id", how="left")
            .select("id", F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id"))
        )

    assignments = record("assignments", ck.stage("assignments", build_assignments))

    # the reference's run counters (notes/old_pipeline.md:106-112 analog)
    verdicts = {
        r["status"]: int(r["n"])
        for r in verified.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    ck.record_counters("verdicts", verdicts)
    return {
        "prepared": prep,
        "candidates": cands,
        "verified": verified,
        "assignments": assignments,
    }
