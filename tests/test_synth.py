"""Tests for the synthetic corpus generator (M0): determinism, the
byte-identical extract_text invariant, and duplicate-family structure."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fuzzycat_spark.sources import extract_text_udf, synth_pages

N_FAMILIES = 40
N_SPAM = 15


@pytest.fixture(scope="module")
def corpus(spark):
    return synth_pages(spark, n_families=N_FAMILIES, n_spam=N_SPAM, with_labels=True).cache()


def test_row_count_and_unique_urls(corpus):
    n = corpus.count()
    assert n == N_FAMILIES * 4 + N_SPAM
    assert corpus.select("url").distinct().count() == n


def test_schema(corpus):
    fields = dict(corpus.dtypes)
    assert fields["url"] == "string"
    assert fields["warc_ts"] == "timestamp"
    assert fields["html"] == "binary"
    assert fields["text"] == "string"
    assert fields["lang"] == "string"


def test_extract_text_byte_identical(corpus):
    # the per-row invariant from BASELINE.json input_hint
    mismatches = (
        corpus.withColumn("extracted", extract_text_udf(F.col("html")))
        .filter(
            F.col("extracted").cast("binary") != F.col("text").cast("binary")
        )
        .count()
    )
    assert mismatches == 0


def test_deterministic(spark, corpus):
    again = synth_pages(spark, n_families=N_FAMILIES, n_spam=N_SPAM, with_labels=True)
    assert corpus.exceptAll(again).count() == 0
    assert again.exceptAll(corpus).count() == 0


def test_family_structure(corpus):
    kinds = {r.kind for r in corpus.select("kind").distinct().collect()}
    assert "original" in kinds and "spam" in kinds and len(kinds) >= 6
    # exact copies really are byte-equal to their original
    orig = corpus.filter(F.col("kind") == "original").select("family", F.col("text").alias("t0"))
    ex = corpus.filter(F.col("kind") == "exact").select("family", "text")
    joined = ex.join(orig, "family")
    assert joined.filter(F.col("text") != F.col("t0")).count() == 0
    # spam block is 3 hot clusters (one per boilerplate variant)
    assert corpus.filter(F.col("kind") == "spam").select("true_cluster_id").distinct().count() == 3
