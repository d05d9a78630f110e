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
