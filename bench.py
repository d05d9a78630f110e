"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

The headline workload is the full dedup pipeline (blocking + LSH + verify +
connected components) over the documents table AND over a larger synthetic
web-page corpus (the graft's real workload shape), plus the individual
operator queries. `docs_per_sec` for the synthetic end-to-end run is the
throughput figure compared against BASELINE.md; scaling evidence across
parallelism levels is produced by tools/bench_scaling.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# 105k docs: large enough that the e2e timing is compute-bound (at 18k the
# ~15-job pipeline is fixed-overhead bound — ~20s of scheduling + checkpoint
# latency regardless of corpus size, see SCALING.md), small enough to keep
# the whole suite under ~90s at local[32]
SYNTH_FAMILIES = int(os.environ.get("SPARK_GRAFT_SYNTH_FAMILIES", "24000"))
SYNTH_SPAM = int(os.environ.get("SPARK_GRAFT_SYNTH_SPAM", "9000"))


def main() -> None:
    import __spark_entry__ as E
    from fuzzycat_spark import get_spark
    from fuzzycat_spark.operators.dedup import DedupConfig, dedup_pages
    from fuzzycat_spark.sources import synth_pages

    spark = get_spark(
        app_name="fuzzycat-spark-bench", cores=CPUS, shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warmup outside every timed window: JVM/codegen spinup plus one tiny
    # pandas-UDF pass over all partitions so the per-core resident Python
    # workers (fork + numpy import, ~0.5 s each) exist before any query is
    # timed — a fixed process cost, not a query cost (long-running cluster
    # executors are warm)
    timings: dict[str, float] = {}
    qs = E.queries()
    # same-shape warmup on the tiny sf0.001 table: first execution of the
    # signature query pays ~5s of one-time codegen + Arrow schema + Python
    # worker spinup per session — process warmup, not query cost
    qs["minhash_sigs"](spark, "/root/testdata/sf0.001").count()
    headline = [
        "minhash_sigs",
        "lsh_candidates",
        "verified_pairs",
        "components",
        "knn",
        "quality",
        "lang_id",
        "fingerprint",
        "simhash",
    ]
    # best-of-N per query, all reps recorded: a single rep on this shared
    # VM carries 10-40% co-tenancy noise (SCALING.md), so one bad sample
    # used to read as a whole-suite regression; the min is the least-noise
    # estimator of a query's actual cost, and the rep list is the variance
    # evidence that makes the recorded number defensible
    reps_n = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    query_reps: dict[str, list[float]] = {}
    for name in headline:
        reps: list[float] = []
        for _ in range(reps_n):
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            reps.append(round(time.time() - t0, 3))
        query_reps[name] = reps
        timings[name] = min(reps)

    # end-to-end synthetic web-page dedup (the production workload shape)
    n_docs = SYNTH_FAMILIES * 4 + SYNTH_SPAM
    pages = synth_pages(spark, n_families=SYNTH_FAMILIES, n_spam=SYNTH_SPAM)
    pages = pages.localCheckpoint()  # time the pipeline, not the generator
    # full-pipeline warmup on a 2% sample (codegen + resident Python
    # workers), then best of reps_n timed runs: C2 JIT finishes compiling
    # the generated code DURING the first full-size pass (measured 1.5-6x
    # on the first run only — the 2% warmup does not fully cover it), and
    # the min is the least-noise estimator on this shared VM (same
    # methodology as tools/bench_scaling.py / SCALING.md; a same-window
    # A/B in round 5 put the rep spread at 30-85s on identical code)
    warm = pages.sample(0.02, seed=1).localCheckpoint()
    _, wa = dedup_pages(warm, DedupConfig())
    wa.count()
    e2e_reps: list[float] = []
    for _ in range(max(2, reps_n)):
        t0 = time.time()
        _, assign = dedup_pages(pages, DedupConfig())
        assert assign.count() == n_docs
        e2e_reps.append(round(time.time() - t0, 3))
    query_reps["pages_dedup_e2e"] = e2e_reps
    pages_sec = min(e2e_reps)
    timings["pages_dedup_e2e"] = pages_sec

    total = round(sum(timings.values()), 3)
    record = {
        "metric": "dedup_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "query_reps": query_reps,
        "estimator": f"min of {reps_n} reps per query",
        "sf": SF_DIR,
        "cpus": CPUS,
        "synth_docs": n_docs,
        "docs_per_sec": round(n_docs / pages_sec, 1),
    }
    # north-rule evidence (same job at two parallelism levels) from the
    # committed campaign artifact — provenance-stamped historical numbers
    # (tools/bench_scaling.py refreshes it), never constants baked into a
    # live bench line as if this run had measured them
    campaign_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "SCALING_CAMPAIGN.json"
    )
    if os.path.exists(campaign_path):
        with open(campaign_path) as f:
            record["scaling_campaign"] = {"historical_reference": True, **json.load(f)}
    print(json.dumps(record))


if __name__ == "__main__":
    main()
