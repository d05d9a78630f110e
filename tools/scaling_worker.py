"""One scaling-bench level: run the full dedup pipeline on a parquet corpus
at a given core count. Usage: python tools/scaling_worker.py <cores> <corpus>.
Prints one JSON line. Used by tools/bench_scaling.py and ad-hoc runs."""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from fuzzycat_spark import get_spark
from fuzzycat_spark.operators.dedup import DedupConfig, dedup_pages


def main() -> None:
    cores = int(sys.argv[1])
    corpus_path = sys.argv[2]
    spark = get_spark(
        app_name=f"scaling-{cores}", cores=cores, shuffle_partitions=cores * 2
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(corpus_path)
    # a 100 TB input arrives in many splits; a single local parquet file
    # does not, so spread it the way the real scan would be
    pages = pages.repartition(cores * 2).localCheckpoint()
    n = pages.count()
    # warmup: JVM/codegen/Python-worker spinup outside the timed window
    _, warm = dedup_pages(pages.limit(200), DedupConfig())
    warm.count()
    t0 = time.time()
    verified, assign = dedup_pages(pages, DedupConfig())
    n_assign = assign.count()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n / wall, 1),
                "assignments": n_assign,
            }
        )
    )


if __name__ == "__main__":
    main()
