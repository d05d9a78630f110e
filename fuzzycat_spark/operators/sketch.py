"""Mergeable fixed-size sketches: LogLog cardinality registers and a
count-min frequency sketch — the corpus-statistics layer that stays
O(1)-sized no matter how many documents flow through it. At 100 TB you
cannot afford `count(distinct token)` per language (a full shuffle of
every token string) or an exact global term-frequency table; both
sketches reduce to a few hundred 16-byte rows per key with ordinary
partial-aggregated `groupBy` — map-side combine collapses each executor's
stream before anything crosses the wire, and register tables from
disjoint corpus shards (or streaming epochs) merge by MAX / SUM, so the
sketch of a union is the merge of the sketches.

Public constructions only: Durand & Flajolet, "Loglog Counting of Large
Cardinalities" (ESA 2003) for the max-rho registers; Cormode &
Muthukrishnan, "An Improved Data Stream Summary: the Count-Min Sketch"
(J. Algorithms 2005) for the frequency rows. The reference has no
streaming-sketch surface (its one global stat is an exact reason
counter, `/root/reference/fuzzycat/cluster.py` counters) — this is part
of the corpus-audit story (`corpus_report`) generalized to sizes where
exact distinct counts stop being a single-node job.

Determinism contract: every hashed decision comes from `md5_field48`
(two independent 48-bit fields of one md5), buckets by modulus, and the
rho observable is pure integer arithmetic — `bit_count((w & -w) - 1) + 1`
(trailing zeros of w, +1), exact in both Spark and DuckDB, so the full
register tables are value-hash gated, not just their float estimates.
The estimators themselves (`loglog_estimate`, `cms_lookup` min) run over
the tiny register tables and are tested against exact counts in pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.hashing import md5_field48

__all__ = [
    "loglog_registers",
    "loglog_merge",
    "loglog_estimate",
    "cms_counts",
    "cms_merge",
    "cms_lookup",
    "bloom_bits",
    "bloom_merge",
    "bloom_contains",
]

# E[2^max_rho] bias correction, alpha_m for m >= 64 (Durand-Flajolet 2003)
_LOGLOG_ALPHA = 0.39701


def _rho(w: Column) -> Column:
    """Position of the lowest set bit of a non-negative 48-bit draw
    (trailing zeros + 1); the w == 0 draw (p = 2^-48) saturates at 49."""
    return (
        F.when(w == 0, F.lit(49))
        .otherwise(F.bit_count((w.bitwiseAND(-w)) - 1) + 1)
        .cast("int")
    )


def loglog_registers(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    b: int = 6,
    seed: int = 42,
) -> DataFrame:
    """(keys..., bucket, rho_max): the 2^b LogLog registers per key
    group. bucket and the rho draw are the two INDEPENDENT 48-bit fields
    of one md5(value ':' seed), so one hash per element. Duplicate
    values produce identical (bucket, rho) rows — max absorbs them, which
    is exactly why the register table estimates DISTINCT counts. ONE
    partial-aggregated shuffle of (keys, bucket, rho) ints; value text
    never crosses the wire."""
    m = 1 << b
    v = F.col(value_col)
    return (
        df.select(
            *keys,
            (md5_field48(v, seed, start=1) % m).cast("int").alias("bucket"),
            _rho(md5_field48(v, seed, start=13)).alias("rho"),
        )
        .groupBy(*keys, "bucket")
        .agg(F.max("rho").alias("rho_max"))
    )


def loglog_merge(*register_tables: DataFrame) -> DataFrame:
    """Union register tables from disjoint shards/epochs into one:
    group-wise MAX. merge(sketch(A), sketch(B)) == sketch(A ∪ B) exactly
    (max is idempotent/commutative), the property that lets per-epoch
    streaming sketches roll up without reprocessing history."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    keys = [c for c in out.columns if c not in ("rho_max",)]
    return out.groupBy(*keys).agg(F.max("rho_max").alias("rho_max"))


def loglog_estimate(
    registers: DataFrame, keys: list[str], b: int = 6
) -> DataFrame:
    """(keys..., est): alpha_m * m * 2^(mean rho over ALL m buckets) —
    buckets that saw no value contribute rho 0 (hence sum/m, not avg over
    present rows). Float by nature, so this is the pytest-validated
    convenience layer over the gated integer registers; standard error
    ~1.3/sqrt(m). Runs on the m-rows-per-key register table, not the
    corpus."""
    m = 1 << b
    agg = registers.groupBy(*keys).agg(F.sum("rho_max").alias("s"))
    return agg.select(
        *keys,
        (
            F.lit(_LOGLOG_ALPHA * m)
            * F.pow(F.lit(2.0), F.col("s").cast("double") / m)
        ).alias("est"),
    )


def _cms_bucket(v: Column, r: int, w: int, seed: int) -> Column:
    return (md5_field48(v, seed * 1000 + r) % w).cast("int")


def cms_counts(
    df: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 64,
    seed: int = 42,
    weight_col: str | None = None,
) -> DataFrame:
    """(r, bucket, cnt): the d x w count-min matrix over the value
    stream (one independent md5 seed per row r). Point-lookup estimates
    are min over rows — always >= the true count, within eps*N with
    probability 1-delta at w = e/eps, d = ln(1/delta). d·w rows of
    ints regardless of corpus size; ONE partial-agg shuffle."""
    v = F.col(value_col)
    wt = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    rows = df.select(
        F.posexplode(
            F.array(*[_cms_bucket(v, r, w, seed) for r in range(d)])
        ).alias("r", "bucket"),
        wt.alias("wt"),
    )
    return rows.groupBy("r", "bucket").agg(F.sum("wt").alias("cnt"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Counts from disjoint shards merge by SUM per cell."""
    out = sketches[0]
    for t in sketches[1:]:
        out = out.unionByName(t)
    return out.groupBy("r", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    cms: DataFrame,
    values: DataFrame,
    value_col: str,
    d: int = 4,
    w: int = 64,
    seed: int = 42,
) -> DataFrame:
    """(value_col, est): count-min point estimate per queried value —
    min over the d cells the value hashes to; cells the sketch never
    touched read 0. The d·w sketch broadcasts; estimation is a broadcast
    join plus a d-row groupBy per value."""
    v = F.col(value_col)
    probe = values.select(
        value_col,
        F.posexplode(
            F.array(*[_cms_bucket(v, r, w, seed) for r in range(d)])
        ).alias("r", "bucket"),
    )
    return (
        probe.join(F.broadcast(cms), ["r", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def _bloom_pos(v: Column, r: int, m_bits: int, seed: int) -> Column:
    return md5_field48(v, seed * 1000 + r) % m_bits


def bloom_bits(
    df: DataFrame,
    value_col: str,
    m_bits: int = 65536,
    d: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(word, bits): a Bloom filter over the value stream as int64 words —
    word = bit_position DIV 32, bits = OR of 1 << (position % 32) (32-bit
    payloads so no signed-shift edge at bit 63; values stay positive and
    engine-portable). Bit positions are d independent `md5_field48` draws
    mod m_bits (Bloom 1970). The membership sketch behind "have we seen
    this URL in ANY previous crawl": m_bits/32 integer rows regardless of
    corpus size, built with ONE partial-aggregated bit_or shuffle, and
    filters from disjoint shards/epochs merge by OR — merge(bloom(A),
    bloom(B)) == bloom(A ∪ B) exactly. Absent words = all-zero (the
    table stores only touched words). Lookups NEVER false-negative;
    false-positive rate ≈ (1 - e^(-d·n/m))^d."""
    v = F.col(value_col)
    rows = df.select(
        F.explode(
            F.array(*[_bloom_pos(v, r, m_bits, seed) for r in range(d)])
        ).alias("pos")
    )
    return (
        rows.select(
            F.expr("pos DIV 32").cast("int").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Filters from disjoint shards merge by bitwise OR per word."""
    out = blooms[0]
    for t in blooms[1:]:
        out = out.unionByName(t)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    bloom: DataFrame,
    values: DataFrame,
    value_col: str,
    m_bits: int = 65536,
    d: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(value_col, may_contain): Bloom membership per queried value —
    true iff ALL d probed bits are set (words the sketch never touched
    read all-zero via the left join). False ⇒ definitely unseen (the
    screen's guarantee); true may be a false positive at the designed
    rate. The m_bits/32-row filter broadcasts; the probe side is d rows
    per value rolled up with bool_and."""
    v = F.col(value_col)
    probe = values.select(
        value_col,
        F.explode(
            F.array(*[_bloom_pos(v, r, m_bits, seed) for r in range(d)])
        ).alias("pos"),
    ).select(
        value_col,
        F.expr("pos DIV 32").cast("int").alias("word"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias("bit"),
    )
    return (
        probe.join(F.broadcast(bloom), ["word"], "left")
        .groupBy(value_col)
        .agg(
            F.bool_and(
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("bit"))
                == F.col("bit")
            ).alias("may_contain")
        )
    )
