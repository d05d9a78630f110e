"""End-to-end pipeline test against the synthetic corpus's golden labels —
the graft's version of the reference's golden verify.csv strategy
(`/root/reference/tests/test_verify.py:51-80`), with pair-level
recall/precision as the metric (north rule: dup-pair recall >= 0.99)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fuzzycat_spark.operators.dedup import DedupConfig, dedup_pages
from fuzzycat_spark.sources import synth_pages


@pytest.fixture(scope="module")
def result(spark):
    corpus = synth_pages(spark, n_families=60, n_spam=30, with_labels=True).cache()
    pages = corpus.select("url", "warc_ts", "html", "text", "lang")
    verified, assign = dedup_pages(pages, DedupConfig())
    labeled = (
        assign.join(corpus.select(F.col("url").alias("id"), "true_cluster_id"), on="id")
        .select("id", "cluster_id", "true_cluster_id")
        .cache()
    )
    labeled.count()
    return labeled


def _pair_metrics(labeled):
    x, y = labeled.alias("x"), labeled.alias("y")
    tp = x.join(
        y,
        (F.col("x.true_cluster_id") == F.col("y.true_cluster_id"))
        & (F.col("x.id") < F.col("y.id")),
    )
    tot = tp.count()
    hit = tp.filter(F.col("x.cluster_id") == F.col("y.cluster_id")).count()
    pp = x.join(
        y,
        (F.col("x.cluster_id") == F.col("y.cluster_id"))
        & (F.col("x.id") < F.col("y.id")),
    )
    ptot = pp.count()
    phit = pp.filter(F.col("x.true_cluster_id") == F.col("y.true_cluster_id")).count()
    return hit / max(tot, 1), phit / max(ptot, 1), tot


def test_dup_pair_recall_and_precision(result):
    recall, precision, total = _pair_metrics(result)
    assert total > 100
    assert recall >= 0.99, f"dup-pair recall {recall} below north-rule threshold"
    assert precision >= 0.98, f"pair precision {precision} too low"


def test_assignments_cover_all_docs(spark, result):
    n_docs = 60 * 4 + 30
    assert result.count() == n_docs
    # cluster_id is always the lexicographic min id of its cluster
    bad = (
        result.groupBy("cluster_id")
        .agg(F.min("id").alias("min_id"))
        .filter(F.col("cluster_id") != F.col("min_id"))
        .count()
    )
    assert bad == 0


def test_all_strategy_pipeline_composes(spark):
    """EVERY strategy enabled at once (the driver's `components_all`
    shape): recall must not drop below the default config's, precision
    must hold, and the extra strategies must not fracture clusters."""
    corpus = synth_pages(spark, n_families=40, n_spam=20, with_labels=True).cache()
    pages = corpus.select("url", "warc_ts", "html", "text", "lang")
    cfg = DedupConfig(
        strategies=("exact", "slug", "minhash", "simhash", "substring")
    )
    _, assign = dedup_pages(pages, cfg)
    labeled = assign.join(
        corpus.select(F.col("url").alias("id"), "true_cluster_id"), on="id"
    ).select("id", "cluster_id", "true_cluster_id")
    recall, precision, total = _pair_metrics(labeled)
    assert total > 50
    assert recall >= 0.99, f"all-strategy recall {recall} below threshold"
    assert precision >= 0.98, f"all-strategy precision {precision} too low"


def test_substring_strategy_clusters_short_contained_docs(spark):
    """A 30-token doc verbatim inside a 600-token doc: every LSH band
    misses it (shingle jaccard ~0.05), but the substring strategy's
    guaranteed-recall candidates + the cascade's CONTAINMENT rule must
    cluster them."""
    from fuzzycat_spark.operators.dedup import DedupConfig, dedup_pages

    words = [f"w{i}" for i in range(600)]
    rows = [
        ("big", " ".join(words)),
        ("small", " ".join(words[200:230])),
        ("other", " ".join(f"z{i}" for i in range(80))),
    ]
    df = spark.createDataFrame(rows, "url string, text string")

    base = DedupConfig(strategies=("exact", "slug", "minhash"))
    _, assign_base = dedup_pages(df, base)
    got_base = {r.id: r.cluster_id for r in assign_base.collect()}

    withss = DedupConfig(strategies=("exact", "slug", "minhash", "substring"))
    verified, assign = dedup_pages(df, withss)
    got = {r.id: r.cluster_id for r in assign.collect()}
    vmap = {(r.id_a, r.id_b): (r.status, r.reason) for r in verified.collect()}

    assert got_base["small"] != got_base["big"]          # the tier LSH misses
    assert got["small"] == got["big"]                    # substring catches it
    assert got["other"] not in (got["big"],)
    assert vmap[("big", "small")] == ("strong", "CONTAINMENT")
