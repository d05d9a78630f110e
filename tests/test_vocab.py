"""Corpus vocabulary / n-gram counts (operators/vocab.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuzzycat_spark.operators.vocab import token_ngram_counts, word_ngrams


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )


class TestTokenNgramCounts:
    def test_unigram_counts(self, spark):
        docs = _docs(spark, ["a b a", "b c", ""])
        got = {
            r["gram"]: r["occurrences"]
            for r in token_ngram_counts(docs, n=1).collect()
        }
        assert got == {"a": 2, "b": 2, "c": 1}

    def test_bigram_counts_and_short_docs(self, spark):
        docs = _docs(spark, ["x y z", "x y", "solo"])
        got = {
            r["gram"]: r["occurrences"]
            for r in token_ngram_counts(docs, n=2).collect()
        }
        # the 1-token doc contributes no bigram; no negative sequence()
        assert got == {"x y": 2, "y z": 1}

    def test_top_k_deterministic_tiebreak(self, spark):
        # four tokens with counts 3,2,2,1: k=2 must select 'top' plus the
        # lexicographically-first of the tied pair
        docs = _docs(spark, ["top top top aa bb", "aa bb zz"])
        rows = token_ngram_counts(docs, n=1, top_k=2).collect()
        assert [(r["gram"], r["occurrences"]) for r in sorted(
            rows, key=lambda r: (-r["occurrences"], r["gram"])
        )] == [("top", 3), ("aa", 2)]

    def test_min_count_prunes_tail(self, spark):
        docs = _docs(spark, ["a a b"])
        got = {r["gram"] for r in token_ngram_counts(docs, min_count=2).collect()}
        assert got == {"a"}

    def test_word_ngrams_n1_passthrough(self, spark):
        row = spark.range(1).select(
            word_ngrams(F.split(F.lit("p q r"), " "), 1).alias("g")
        ).first()
        assert row["g"] == ["p", "q", "r"]
