"""Stage-level profiling for the headline queries (guide §1: measure first).

Times each internal stage of q_components / dedup_pages with explicit job
descriptions and noop-sink isolation, so the per-stage cost (not the sink)
is what's recorded. Not part of the frozen bench — evidence for
OPTIMIZATION_r06.md only.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
WHAT = os.environ.get("PROFILE_WHAT", "components")


def t(spark, name, fn):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {name:32s} {dt:7.3f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    return out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def profile_components(spark):
    import __spark_entry__ as E
    from fuzzycat_spark.operators.dedup import candidate_pairs
    from fuzzycat_spark.operators.verify import prepare_pages, verify_pairs
    from fuzzycat_spark.operators.components import connected_components
    from pyspark.sql import functions as F

    docs = E._docs(spark, SF_DIR)
    prep = t(spark, "prep(materialize)", lambda: prepare_pages(docs, "doc_id", "text"))
    cands = t(spark, "candidates", lambda: candidate_pairs(docs, E.DOC_CFG, prep=prep))
    t(spark, "cands.noop", lambda: noop(cands))
    verified = verify_pairs(cands, prep)
    t(spark, "verify.noop", lambda: noop(verified))
    verified = t(spark, "verified.localCheckpoint", lambda: verify_pairs(cands, prep).localCheckpoint())
    edges = verified.filter(F.col("status").isin("exact", "strong"))
    cc = t(spark, "connected_components", lambda: connected_components(edges))
    out = docs.select(F.col("doc_id").alias("id")).join(cc, on="id", how="left").select(
        "id", F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id")
    )
    t(spark, "final-join.noop", lambda: noop(out))


def profile_e2e(spark):
    from fuzzycat_spark.operators.dedup import (
        DedupConfig, dedup_stages, star_edges, HARD_STAGES,
    )
    from fuzzycat_spark.plans.checkpoint import materialize
    from fuzzycat_spark.sources import synth_pages

    fam = int(os.environ.get("SPARK_GRAFT_SYNTH_FAMILIES", "24000"))
    spam = int(os.environ.get("SPARK_GRAFT_SYNTH_SPAM", "9000"))
    pages = synth_pages(spark, n_families=fam, n_spam=spam).localCheckpoint()
    cfg = DedupConfig()
    # warmup (same shape as bench)
    warm = pages.sample(0.02, seed=1).localCheckpoint()
    from fuzzycat_spark.operators.dedup import dedup_pages
    _, wa = dedup_pages(warm, cfg)
    wa.count()

    for rep in range(2):
        print(f"-- e2e rep {rep}")
        timings = {}

        def stage(name, build):
            t0 = time.time()
            df = build()
            if name in HARD_STAGES:
                df = materialize(df, name)
            timings[name] = time.time() - t0
            print(f"  stage {name:24s} {timings[name]:7.3f}s", flush=True)
            return df

        t0 = time.time()
        out = dedup_stages(pages, cfg, stage)
        n = out["assignments"].count()
        print(f"  assignments.count({n})        {time.time() - t0 - sum(timings.values()):7.3f}s (incl. CC)")
        print(f"  TOTAL                          {time.time() - t0:7.3f}s")


def main():
    from fuzzycat_spark import get_spark

    spark = get_spark(app_name="profile-stages", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    E.queries()["minhash_sigs"](spark, "/root/testdata/sf0.001").count()  # warmup
    if WHAT == "components":
        for rep in range(2):
            print(f"-- components rep {rep}")
            profile_components(spark)
    elif WHAT == "e2e":
        profile_e2e(spark)


if __name__ == "__main__":
    main()
