"""Loader-facing JSONL shard export (operators/sharding.py
export_jsonl_shards / jsonl_shard_manifest)."""

from __future__ import annotations

import glob
import gzip
import hashlib
import json

import pytest
from pyspark.sql import functions as F

from fuzzycat_spark.operators.sharding import (
    export_jsonl_shards,
    jsonl_shard_manifest,
    shard_table,
)

N_SHARDS = 4
SEED = 5


@pytest.fixture(scope="module")
def docs(spark):
    # unicode, quotes, newlines, and backslashes all must survive the
    # JSON round trip byte-exactly
    return spark.range(300).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(
            F.lit('héllo "q" \\ tab\t nl\n №'), F.col("id").cast("string")
        ).alias("text"),
    )


def _read_lines(path: str) -> dict[int, list[str]]:
    """shard -> decoded jsonl lines in on-disk order."""
    out: dict[int, list[str]] = {}
    for d in sorted(glob.glob(path + "/shard=*")):
        shard = int(d.rsplit("=", 1)[1])
        files = [f for f in sorted(glob.glob(d + "/part-*")) if not f.endswith(".crc")]
        lines: list[str] = []
        for f in files:
            opener = gzip.open if f.endswith(".gz") else open
            with opener(f, "rt", encoding="utf-8") as fh:
                lines.extend(ln.rstrip("\n") for ln in fh if ln)
        out[shard] = lines
    return out


class TestExport:
    def test_round_trip_and_layout(self, spark, docs, tmp_path):
        path = str(tmp_path / "jz")
        export_jsonl_shards(docs, path, N_SHARDS, seed=SEED)
        by_shard = _read_lines(path)

        # exactly one data file per shard directory
        for d in sorted(glob.glob(path + "/shard=*")):
            parts = [
                f for f in glob.glob(d + "/part-*") if not f.endswith(".crc")
            ]
            assert len(parts) == 1, d

        # every row survives json round-trip with exact text
        src = {r["doc_id"]: r["text"] for r in docs.collect()}
        seen = {}
        for lines in by_shard.values():
            for ln in lines:
                rec = json.loads(ln)
                seen[rec["doc_id"]] = rec["text"]
        assert seen == src

        # placement and in-file order match shard_table exactly
        expect = {
            s: [r["doc_id"] for r in rows]
            for s, rows in _grouped(
                shard_table(docs, N_SHARDS, seed=SEED)
                .orderBy("shard", "shard_pos")
                .collect()
            ).items()
        }
        got = {
            s: [json.loads(ln)["doc_id"] for ln in lines]
            for s, lines in by_shard.items()
        }
        assert got == expect

    def test_deterministic_bytes(self, spark, docs, tmp_path):
        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        export_jsonl_shards(docs, p1, N_SHARDS, seed=SEED)
        export_jsonl_shards(docs, p2, N_SHARDS, seed=SEED)
        h1, h2 = _dir_hashes(p1), _dir_hashes(p2)
        assert h1 == h2 and len(h1) == N_SHARDS

    def test_spark_reads_it_back(self, spark, docs, tmp_path):
        path = str(tmp_path / "jz")
        export_jsonl_shards(docs, path, N_SHARDS, seed=SEED)
        back = spark.read.text(path)
        assert "shard" in back.columns  # partition discovery
        parsed = back.select(
            F.from_json(
                "value", "doc_id string, text string"
            ).alias("r")
        ).select("r.*")
        assert sorted(map(tuple, parsed.collect())) == sorted(
            map(tuple, docs.collect())
        )

    def test_extra_cols(self, spark, docs, tmp_path):
        path = str(tmp_path / "jz")
        export_jsonl_shards(
            docs.withColumn("lang", F.lit("en")),
            path,
            2,
            seed=SEED,
            extra_cols=("lang",),
        )
        lines = _read_lines(path)
        rec = json.loads(next(iter(lines.values()))[0])
        assert rec["lang"] == "en"


class TestManifest:
    def test_matches_decoded_files(self, spark, docs, tmp_path):
        path = str(tmp_path / "jz")
        export_jsonl_shards(docs, path, N_SHARDS, seed=SEED)
        man = {
            r["shard"]: (r["n_docs"], r["n_chars"], r["content_h"])
            for r in jsonl_shard_manifest(docs, N_SHARDS, seed=SEED).collect()
        }
        assert len(man) == N_SHARDS
        for shard, lines in _read_lines(path).items():
            recs = [json.loads(ln) for ln in lines]
            xor = 0
            for rec in recs:
                payload = (rec["doc_id"] + "\x01" + rec["text"]).encode("utf-8")
                xor ^= int(hashlib.md5(payload).hexdigest()[:12], 16)
            assert man[shard] == (
                len(recs),
                sum(len(rec["text"]) for rec in recs),
                xor,
            )

    def test_flips_on_any_row_change(self, spark, docs):
        base = {
            r["shard"]: r["content_h"]
            for r in jsonl_shard_manifest(docs, N_SHARDS, seed=SEED).collect()
        }
        tweaked = docs.withColumn(
            "text",
            F.when(F.col("doc_id") == "7", F.lit("corrupted")).otherwise(
                F.col("text")
            ),
        )
        after = {
            r["shard"]: r["content_h"]
            for r in jsonl_shard_manifest(tweaked, N_SHARDS, seed=SEED).collect()
        }
        assert sum(1 for s in base if base[s] != after[s]) == 1


def _grouped(rows):
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r["shard"], []).append(r)
    return out


def _dir_hashes(path: str) -> dict[int, str]:
    out = {}
    for d in sorted(glob.glob(path + "/shard=*")):
        shard = int(d.rsplit("=", 1)[1])
        parts = [f for f in sorted(glob.glob(d + "/part-*")) if not f.endswith(".crc")]
        h = hashlib.md5()
        for f in parts:
            with gzip.open(f, "rb") as fh:  # hash DECODED bytes: gzip
                h.update(fh.read())  # headers embed an OS byte
        out[shard] = h.hexdigest()
    return out
