"""Training-shard emission (operators/sharding.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from fuzzycat_spark.operators.sharding import shard_table, write_training_shards


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("t"), F.col("id")).alias("text")
    )


class TestShardTable:
    def test_covers_all_rows_balanced(self, spark, docs):
        out = shard_table(docs, n_shards=8, seed=5)
        sizes = {r["shard"]: r["n"] for r in out.groupBy("shard").count()
                 .withColumnRenamed("count", "n").collect()}
        assert set(sizes) == set(range(8))
        assert sum(sizes.values()) == 2000
        # md5 grid: 2000/8 = 250/shard expected, allow 3-sigma-ish slack
        assert max(sizes.values()) < 1.35 * min(sizes.values())

    def test_positions_are_dense_per_shard(self, spark, docs):
        out = shard_table(docs, n_shards=4, seed=0)
        agg = out.groupBy("shard").agg(
            F.count("*").alias("n"),
            F.min("shard_pos").alias("lo"),
            F.max("shard_pos").alias("hi"),
        )
        for r in agg.collect():
            assert r["lo"] == 0 and r["hi"] == r["n"] - 1

    def test_partition_and_retry_invariant(self, spark, docs):
        a = shard_table(docs, 8, seed=2).select("doc_id", "shard", "shard_pos")
        b = shard_table(docs.repartition(17), 8, seed=2).select(
            "doc_id", "shard", "shard_pos"
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))

    def test_matches_python_md5(self, spark, docs):
        rows = shard_table(docs, 8, seed=5).limit(0).union(
            shard_table(docs.where(F.col("doc_id") < 20), 8, seed=5)
        ).collect()
        for r in rows:
            h = hashlib.md5(f"{r['doc_id']}:5".encode()).hexdigest()
            assert r["shard"] == int(h[:12], 16) % 8

    def test_order_decorrelated_from_id(self, spark, docs):
        # the shuffled order must not be the id order: positions within a
        # shard should disagree with the id-sorted rank almost everywhere
        out = shard_table(docs, 2, seed=1)
        w_id = F.row_number().over(
            Window.partitionBy("shard").orderBy("doc_id")
        ) - F.lit(1)
        frac_same = (
            out.withColumn("id_pos", w_id)
            .select(F.avg((F.col("shard_pos") == F.col("id_pos")).cast("int")))
            .first()[0]
        )
        assert frac_same < 0.05


class TestWriter:
    def test_writes_sorted_shard_dirs(self, spark, docs, tmp_path):
        path = str(tmp_path / "shards")
        write_training_shards(docs, path, n_shards=4, seed=3)
        back = spark.read.parquet(path)
        assert back.count() == 2000
        assert set(r["shard"] for r in back.select("shard").distinct().collect()) == set(
            range(4)
        )
        # within each shard the file order IS the deterministic order:
        # re-deriving the order key and checking monotonicity per shard
        import pandas as pd  # noqa: F401

        expected = {
            r["doc_id"]: (r["shard"], r["shard_pos"])
            for r in shard_table(docs, 4, seed=3).collect()
        }
        for shard in range(4):
            pdf = (
                spark.read.parquet(f"{path}/shard={shard}")
                .select("doc_id")
                .toPandas()
            )
            ids = list(pdf["doc_id"])
            pos = [expected[i][1] for i in ids]
            assert all(expected[i][0] == shard for i in ids)
            assert pos == sorted(pos)
