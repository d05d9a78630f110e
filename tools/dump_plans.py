"""Dump .explain('formatted') for the headline queries and the e2e dedup
stage frames into a directory (plans/r06/<name>_{before,after}.txt).

Usage: python tools/dump_plans.py <out_dir> <suffix>
Run from the tree whose plans you want (the round-start worktree for
'before', the optimized tree for 'after').
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
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


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    from fuzzycat_spark import get_spark

    spark = get_spark(app_name="dump-plans", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E

    qs = E.queries()
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(explain_str(df))
        print(f"wrote {name}_{suffix}", flush=True)

    # e2e (pages_dedup_e2e in bench.py): capture the per-stage plans of the
    # flagship pipeline — CC runs imperatively, so the stage frames are the
    # meaningful explain surfaces.
    from fuzzycat_spark.operators.dedup import DedupConfig, dedup_stages, HARD_STAGES
    from fuzzycat_spark.plans.checkpoint import materialize
    from fuzzycat_spark.sources import synth_pages

    pages = synth_pages(spark, n_families=2000, n_spam=500).localCheckpoint()
    plans: dict[str, str] = {}

    def stage(name, build):
        df = build()
        plans[name] = explain_str(df)
        return materialize(df, name) if name in HARD_STAGES else df

    out = dedup_stages(pages, DedupConfig(), stage)
    plans["assignments_final_join"] = explain_str(out["assignments"])
    for name, text in plans.items():
        with open(
            os.path.join(out_dir, f"pages_dedup_e2e_{name}_{suffix}.txt"), "w"
        ) as f:
            f.write(text)
        print(f"wrote pages_dedup_e2e_{name}_{suffix}", flush=True)


if __name__ == "__main__":
    main()
