"""Duplicate-span removal (operators/spans.py) and sequence packing
(operators/sharding.pack_shard_sequences)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuzzycat_spark.operators.sharding import pack_shard_sequences, shard_table
from fuzzycat_spark.operators.spans import (
    dup_span_starts,
    raw_tokens,
    strip_dup_spans,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _out(df):
    return {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in df.collect()
    }


class TestStripDupSpans:
    def test_cross_doc_span_removed_from_all_occurrences(self, spark):
        shared = "lorem ipsum dolor sit amet"  # 5 tokens = one k=5 gram
        docs = _mk(
            spark,
            [
                ("a", f"alpha {shared} beta"),
                ("b", f"gamma delta {shared}"),
                ("c", "entirely unrelated text here now"),
            ],
        )
        got = _out(strip_dup_spans(docs, k=5))
        assert got["a"] == ("alpha beta", 7, 5)
        assert got["b"] == ("gamma delta", 7, 5)
        assert got["c"] == ("entirely unrelated text here now", 5, 0)

    def test_longer_span_removed_maximally_neighbors_kept(self, spark):
        # 7-token shared span: every one of its three 5-grams duplicates,
        # coverage removes exactly the 7 tokens, flanks survive
        span = "one two three four five six seven"
        docs = _mk(spark, [("a", f"L {span} R"), ("b", f"X {span}")])
        got = _out(strip_dup_spans(docs, k=5))
        assert got["a"] == ("L R", 9, 7)
        assert got["b"] == ("X", 8, 7)

    def test_within_doc_repeat_counts_as_duplicate(self, spark):
        span = "p q r s t"
        docs = _mk(spark, [("a", f"{span} mid {span}"), ("b", "clean doc")])
        got = _out(strip_dup_spans(docs, k=5))
        assert got["a"] == ("mid", 11, 10)
        assert got["b"][2] == 0

    def test_docs_shorter_than_k_untouched(self, spark):
        docs = _mk(spark, [("a", "same four tokens"), ("b", "same four tokens")])
        got = _out(strip_dup_spans(docs, k=5))
        assert got["a"] == ("same four tokens", 3, 0)
        assert got["b"] == ("same four tokens", 3, 0)

    def test_doc_reduced_to_empty_and_empty_input(self, spark):
        span = "a b c d e"
        docs = _mk(spark, [("a", span), ("b", span), ("c", ""), ("d", "   ")])
        got = _out(strip_dup_spans(docs, k=5))
        assert got["a"] == ("", 5, 5)
        assert got["b"] == ("", 5, 5)
        assert got["c"] == ("", 0, 0)
        assert got["d"] == ("", 0, 0)

    def test_whitespace_variants_tokenize_identically(self, spark):
        # tabs/newlines/CR are separators; the gram text is space-joined
        docs = _mk(
            spark,
            [("a", "u v\tw\nx\ry end1"), ("b", "u v w x y end2")],
        )
        got = _out(strip_dup_spans(docs, k=5))
        assert got["a"] == ("end1", 6, 5)
        assert got["b"] == ("end2", 6, 5)

    def test_min_count_three_spares_pairs(self, spark):
        span = "m n o p q"
        docs = _mk(spark, [("a", span), ("b", span), ("c", "other text")])
        got = _out(strip_dup_spans(docs, k=5, min_count=3))
        assert got["a"][2] == 0 and got["b"][2] == 0
        got3 = _out(
            strip_dup_spans(
                docs.union(_mk(spark, [("d", span)])), k=5, min_count=3
            )
        )
        assert got3["a"] == ("", 5, 5) and got3["d"] == ("", 5, 5)

    def test_extra_columns_preserved(self, spark):
        docs = spark.createDataFrame(
            [("a", "x y z", 7), ("b", "x y z", 8)],
            "doc_id string, text string, keep int",
        )
        out = strip_dup_spans(docs, k=3)
        assert set(out.columns) == {"doc_id", "text", "keep", "n_tokens", "n_removed"}
        assert {r["keep"] for r in out.collect()} == {7, 8}

    def test_dup_span_starts_positions(self, spark):
        span = "s1 s2 s3 s4 s5"
        docs = _mk(spark, [("a", f"pre {span}"), ("b", span)])
        starts = {
            (r["_id"], r["_pos"]) for r in dup_span_starts(docs, k=5).collect()
        }
        assert starts == {("a", 1), ("b", 0)}

    def test_raw_tokens_keeps_case_and_punct(self, spark):
        row = spark.range(1).select(
            raw_tokens(F.lit("Hello, WORLD!  x")).alias("t")
        ).first()
        assert row["t"] == ["Hello,", "WORLD!", "x"]


class TestPackShardSequences:
    def test_matches_manual_greedy_concat(self, spark):
        docs = spark.createDataFrame(
            [(f"d{i}", "tok " * (i % 7 + 1)) for i in range(200)],
            "doc_id string, text string",
        )
        B, S = 10, 4
        out = pack_shard_sequences(docs, seq_len=B, n_shards=S, seed=3)
        rows = sorted(
            out.collect(), key=lambda r: (r["shard"], r["shard_pos"])
        )
        offs = {}
        for r in rows:
            start = offs.get(r["shard"], 0)
            assert r["start_off"] == start
            assert r["start_seq"] == start // B
            assert r["end_seq"] == (start + r["n_tokens"] - 1) // B
            offs[r["shard"]] = start + r["n_tokens"]
        # packing layout agrees with shard_table's order exactly
        st = {
            (r["doc_id"]): (r["shard"], r["shard_pos"])
            for r in shard_table(docs, S, seed=3).collect()
        }
        for r in rows:
            assert st[r["doc_id"]] == (r["shard"], r["shard_pos"])

    def test_empty_docs_occupy_no_slot(self, spark):
        docs = spark.createDataFrame(
            [("a", "x y z"), ("b", ""), ("c", "p q")],
            "doc_id string, text string",
        )
        out = {r["doc_id"]: r for r in pack_shard_sequences(
            docs, seq_len=4, n_shards=1, seed=0
        ).collect()}
        assert out["b"]["n_tokens"] == 0
        assert out["b"]["start_seq"] is None and out["b"]["end_seq"] is None
        # the empty doc's successor starts where the predecessor ended
        total = sum(r["n_tokens"] for r in out.values())
        assert max(r["start_off"] + r["n_tokens"] for r in out.values()) == total

    def test_doc_straddles_boundary(self, spark):
        # single shard, order known only after hashing: verify invariant
        # that a doc with start_off < kB <= start_off+n spans seqs
        docs = spark.createDataFrame(
            [("a", "t " * 7), ("b", "t " * 7)], "doc_id string, text string"
        )
        rows = sorted(
            pack_shard_sequences(docs, seq_len=5, n_shards=1, seed=0).collect(),
            key=lambda r: r["shard_pos"],
        )
        assert [r["start_off"] for r in rows] == [0, 7]
        assert (rows[0]["start_seq"], rows[0]["end_seq"]) == (0, 1)
        assert (rows[1]["start_seq"], rows[1]["end_seq"]) == (1, 2)

    def test_count_col_override(self, spark):
        docs = spark.createDataFrame(
            [("a", "ignored", 100), ("b", "ignored", 50)],
            "doc_id string, text string, n int",
        )
        out = pack_shard_sequences(
            docs, seq_len=64, n_shards=1, count_col="n", seed=0
        )
        assert {r["n_tokens"] for r in out.collect()} == {100, 50}
