"""Resumable pipeline: stage checkpoints, lineage counters, resume-from-
last-stage, and the star-join / status-ranking operators."""

from __future__ import annotations

import json
import os
import tempfile

import pyspark.sql.functions as F
import pytest

from fuzzycat_spark.operators.dedup import DedupConfig
from fuzzycat_spark.operators.pairs import star_pairs, status_ranked_matches
from fuzzycat_spark.plans.checkpoint import StageCheckpointer
from fuzzycat_spark.plans.pipeline import run_dedup_pipeline
from fuzzycat_spark.sources import synth_pages


def test_pipeline_stages_and_resume(spark):
    base = tempfile.mkdtemp()
    pages = synth_pages(spark, n_families=30, n_spam=10)
    ck = StageCheckpointer(spark, base)
    out = run_dedup_pipeline(pages, ck, DedupConfig())
    n = out["assignments"].count()
    assert n == 30 * 4 + 10
    manifest = json.load(open(os.path.join(base, "_manifest.json")))
    for stage in ("prepared", "candidates", "verified", "assignments"):
        assert stage in manifest
        assert manifest[stage]["counters"]["n_rows"] > 0
        assert manifest[stage]["counters"]["n_partitions"] >= 1
    assert "verdicts" in manifest

    # resume: same checkpointer dir loads instead of recomputing — verify by
    # corrupting nothing and checking the stage parquet mtimes are reused
    ck2 = StageCheckpointer(spark, base)
    before = os.path.getmtime(manifest["verified"]["path"])
    out2 = run_dedup_pipeline(pages, ck2, DedupConfig(), lineage=False)
    assert out2["assignments"].count() == n
    assert os.path.getmtime(manifest["verified"]["path"]) == before  # not rewritten


def test_star_pairs(spark):
    rows = [
        ("p1", "k1", "release"),
        ("r1", "k1", "ref"),
        ("r2", "k1", "ref"),
        ("p2", "k2", "release"),
        ("lonely", "k3", "ref"),
    ]
    df = spark.createDataFrame(rows, "url string, key string, role string")
    got = {
        (r.id_a, r.id_b)
        for r in star_pairs(df, F.col("key"), "role", "release").collect()
    }
    # pivot vs members only — no ref-ref pair, no pivot without members
    assert got == {("p1", "r1"), ("p1", "r2")}


def test_status_ranked_matches(spark):
    rows = [
        ("a", "x", "weak", "W"),
        ("a", "y", "exact", "E"),
        ("a", "z", "different", "D"),
        ("b", "q", "ambiguous", "U"),
    ]
    v = spark.createDataFrame(rows, "id_a string, id_b string, status string, reason string")
    got = {r.probe: (r.match, r.status) for r in status_ranked_matches(v).collect()}
    assert got == {"a": ("y", "exact"), "b": ("q", "ambiguous")}


def test_sweep_spares_live_dir_with_fresh_heartbeat(tmp_path):
    """A session in a long compute phase (dir mtime hours old, heartbeat
    fresh) must survive a concurrent sweep; a truly dead dir must not."""
    import os
    import time as _time

    from fuzzycat_spark.plans.checkpoint import (
        HEARTBEAT,
        _sweep_stale,
        _touch_heartbeat,
    )

    root = str(tmp_path)
    old = 4 * 3600
    live = os.path.join(root, "fuzzycat_ckpt_live")
    dead = os.path.join(root, "fuzzycat_ckpt_dead")
    for d in (live, dead):
        os.makedirs(d)
    _touch_heartbeat(live)
    stale = _time.time() - old
    # age the dirs themselves AND the dead dir's contents
    os.utime(live, (stale, stale))
    os.utime(dead, (stale, stale))
    hb = os.path.join(live, HEARTBEAT)
    assert os.path.exists(hb)  # heartbeat mtime stays fresh
    _sweep_stale(root, "fuzzycat_ckpt_")
    assert os.path.isdir(live)
    assert not os.path.exists(dead)
