"""LogLog + count-min sketches (operators/sketch.py)."""

from pyspark.sql import functions as F

from fuzzycat_spark.operators.sketch import (
    cms_counts,
    cms_lookup,
    cms_merge,
    loglog_estimate,
    loglog_merge,
    loglog_registers,
)


def _vals(spark, n, group="g"):
    return spark.range(n).select(
        F.lit(group).alias("grp"), F.concat(F.lit("v"), F.col("id")).alias("val")
    )


def test_registers_ignore_duplicates(spark):
    once = _vals(spark, 200)
    thrice = once.unionByName(once).unionByName(once)
    a = sorted(map(tuple, loglog_registers(once, ["grp"], "val").collect()))
    b = sorted(map(tuple, loglog_registers(thrice, ["grp"], "val").collect()))
    assert a == b
    assert all(1 <= r[2] <= 49 and 0 <= r[1] < 64 for r in a)


def test_merge_of_shards_equals_whole(spark):
    whole = _vals(spark, 3000)
    lo = whole.filter(F.col("val") < "v2")  # lexicographic split, overlapping none
    hi = whole.subtract(lo)
    merged = loglog_merge(
        loglog_registers(lo, ["grp"], "val"), loglog_registers(hi, ["grp"], "val")
    )
    direct = loglog_registers(whole, ["grp"], "val")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_estimate_within_loglog_error(spark):
    df = _vals(spark, 5000, "a").unionByName(_vals(spark, 800, "b"))
    regs = loglog_registers(df, ["grp"], "val", b=6)
    est = {r.grp: r.est for r in loglog_estimate(regs, ["grp"], b=6).collect()}
    # standard error ~1.3/sqrt(64) = 16%; allow 3 sigma
    assert abs(est["a"] - 5000) / 5000 < 0.5, est
    assert abs(est["b"] - 800) / 800 < 0.5, est


def test_cms_never_underestimates_and_is_tight_when_sparse(spark):
    rows = [("tok%d" % (i % 20),) for i in range(400)] + [("rare",)]
    df = spark.createDataFrame(rows, "val string")
    cms = cms_counts(df, "val", d=4, w=64)
    truth = {r.val: r.n for r in df.groupBy("val").agg(F.count("*").alias("n")).collect()}
    est = {
        r.val: r.est
        for r in cms_lookup(cms, df.distinct(), "val", d=4, w=64).collect()
    }
    assert all(est[v] >= truth[v] for v in truth)
    # 21 distinct values in a 4x64 sketch: collisions are rare enough
    # that at least the min row is exact for most values
    exact = sum(1 for v in truth if est[v] == truth[v])
    assert exact >= 15, (est, truth)


def test_cms_absent_value_reads_small(spark):
    df = spark.createDataFrame([("present%d" % i,) for i in range(50)], "val string")
    cms = cms_counts(df, "val", d=4, w=64)
    ghost = df.sparkSession.createDataFrame([("never-seen",)], "val string")
    est = cms_lookup(cms, ghost, "val", d=4, w=64).collect()[0].est
    assert 0 <= est <= 3


def test_cms_merge_equals_whole(spark):
    df = spark.createDataFrame([("t%d" % (i % 7),) for i in range(100)], "val string")
    a = df.limit(40)
    b = df.subtract(a.withColumn("_x", F.lit(1)).drop("_x"))  # disjoint rows not needed: counts sum
    merged = cms_merge(cms_counts(a, "val"), cms_counts(df.exceptAll(a), "val"))
    direct = cms_counts(df, "val")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, direct.collect()))


def test_weighted_cms(spark):
    df = spark.createDataFrame([("x", 5), ("x", 7), ("y", 1)], "val string, wt long")
    cms = cms_counts(df, "val", d=2, w=32, weight_col="wt")
    est = {
        r.val: r.est
        for r in cms_lookup(cms, df.select("val").distinct(), "val", d=2, w=32).collect()
    }
    assert est["x"] == 12 and est["y"] == 1


def test_bloom_never_false_negative(spark):
    from fuzzycat_spark.operators.sketch import bloom_bits, bloom_contains

    vals = _vals(spark, 300)
    bloom = bloom_bits(vals, "val", m_bits=4096, d=3)
    got = bloom_contains(bloom, vals, "val", m_bits=4096, d=3).collect()
    assert len(got) == 300
    assert all(r.may_contain for r in got)


def test_bloom_rejects_most_unseen(spark):
    from fuzzycat_spark.operators.sketch import bloom_bits, bloom_contains

    seen = _vals(spark, 300)
    unseen = spark.range(300).select(
        F.concat(F.lit("absent"), F.col("id")).alias("val")
    )
    bloom = bloom_bits(seen, "val", m_bits=8192, d=3)
    got = bloom_contains(bloom, unseen, "val", m_bits=8192, d=3).collect()
    # fill ~ 900/8192 -> per-probe fp ~ (0.104)^3 ~ 1.1e-3; 300 probes
    hits = sum(r.may_contain for r in got)
    assert hits <= 5


def test_bloom_merge_equals_union(spark):
    from fuzzycat_spark.operators.sketch import bloom_bits, bloom_merge

    whole = _vals(spark, 500)
    lo = whole.filter(F.col("val") < "v3")
    hi = whole.subtract(lo)
    merged = bloom_merge(
        bloom_bits(lo, "val", m_bits=2048, d=2),
        bloom_bits(hi, "val", m_bits=2048, d=2),
    )
    direct = bloom_bits(whole, "val", m_bits=2048, d=2)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bloom_bits_stay_in_uint32_range(spark):
    from fuzzycat_spark.operators.sketch import bloom_bits

    bloom = bloom_bits(_vals(spark, 2000), "val", m_bits=256, d=4)
    rows = bloom.collect()
    # 256 bits / 32-bit words = at most 8 words, all payloads positive
    assert len(rows) <= 8
    assert all(0 < r.bits < (1 << 32) for r in rows)
    assert all(0 <= r.word < 8 for r in rows)
