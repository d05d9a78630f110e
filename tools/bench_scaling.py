"""Scaling-efficiency evidence for the north rule: run the SAME end-to-end
dedup job on the SAME input at two parallelism levels (local[8] and
local[32] — the sandbox stand-in for N and 4N executors) and report
throughput at both plus scaling efficiency.

Usage: python tools/bench_scaling.py [n_families] [n_spam]
Writes results to stdout (JSON) — tools/write_bench_md.py renders BENCH.md.

Each level runs in a fresh subprocess (its own JVM) so neither run inherits
the other's warmed JIT/code cache.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

N_FAMILIES = int(sys.argv[1]) if len(sys.argv) > 1 else 15000
N_SPAM = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
LEVELS = (8, 32)

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from fuzzycat_spark import get_spark
from fuzzycat_spark.operators.dedup import DedupConfig, dedup_pages
from pyspark.sql import functions as F

cores = int(sys.argv[1])
corpus_path = sys.argv[2]
spark = get_spark(app_name=f"scaling-{cores}", cores=cores, shuffle_partitions=cores * 2)
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(corpus_path)
# a 100 TB input arrives in many splits; a single tiny parquet file does
# not, so spread it the way the real scan would be
pages = pages.repartition(cores * 2).localCheckpoint()
n = pages.count()
# warmup: JVM/codegen/Python-worker spinup on a tiny slice, so the timed
# run measures the pipeline rather than first-action latency
_, warm = dedup_pages(pages.limit(200), DedupConfig())
warm.count()
t0 = time.time()
verified, assign = dedup_pages(pages, DedupConfig())
n_assign = assign.count()
wall = time.time() - t0
print(json.dumps({"cores": cores, "docs": n, "wall_sec": round(wall, 2),
                  "docs_per_sec": round(n / wall, 1), "assignments": n_assign}))
"""


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="scaling_corpus_")
    corpus_path = os.path.join(tmp, "pages")
    gen = f"""
import sys
sys.path.insert(0, "/root/repo")
from fuzzycat_spark import get_spark
from fuzzycat_spark.sources import synth_pages
spark = get_spark(cores=32)
spark.sparkContext.setLogLevel("ERROR")
synth_pages(spark, n_families={N_FAMILIES}, n_spam={N_SPAM}).write.mode("overwrite").parquet({corpus_path!r})
"""
    subprocess.run([sys.executable, "-c", gen], check=True,
                   stderr=subprocess.DEVNULL)

    results = []
    for cores in LEVELS:
        out = subprocess.run(
            [sys.executable, "-c", WORKER, str(cores), corpus_path],
            check=True, capture_output=True, text=True,
        )
        line = out.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
        print(line, flush=True)

    lo, hi = results[0], results[-1]
    speedup = lo["wall_sec"] / hi["wall_sec"]
    ideal = hi["cores"] / lo["cores"]
    efficiency = speedup / ideal
    summary = {
        "n_docs": hi["docs"],
        "levels": results,
        "speedup": round(speedup, 3),
        "ideal_speedup": ideal,
        "scaling_efficiency": round(efficiency, 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
