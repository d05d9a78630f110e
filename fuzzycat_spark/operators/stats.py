"""Distribution audits at corpus scale: binned quantiles over an integer
measure (doc length, token count, PII hits) without a global sort.

Exact per-key percentiles need an order statistic — at 10^12 documents
that is a full sort of the measure column per key, the one plan shape
this repo bans from audits. The scalable substitute is the classic
fixed-width histogram: ONE partial-aggregated groupBy onto integer bins
(map-side combine collapses each executor's stream; the histogram is
O(max_value / bin_width) rows per key forever), then quantiles read off
the cumulative counts of the TINY histogram with a window. The answer is
the true quantile rounded up to its bin's upper edge — error bounded by
bin_width, chosen by the caller.

The reference has no distribution surface (its audits are exact counters,
`/root/reference/fuzzycat/cluster.py`); this generalizes the
corpus-report story to "what is P99 doc length per language", the number
that sizes `spark.sql.files.maxPartitionBytes` and shingle caps before a
100 TB run.

Determinism: bins, counts, cumulative sums, and the `100*cum >= q*n`
rank comparison are all int64 arithmetic — exact under any reduction
order, hash-identical in the DuckDB oracle. NULL measures are excluded
(they carry no length), counted nowhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["binned_quantiles"]


def binned_quantiles(
    df: DataFrame,
    value_col: str,
    quantiles: tuple[int, ...] = (50, 90, 99),
    bin_width: int = 100,
    keys: tuple[str, ...] = (),
) -> DataFrame:
    """(keys..., q, est, n): per-key percentile estimates of an integer
    measure. est is the upper edge `(bin+1)*bin_width` of the first
    histogram bin whose cumulative count reaches ceil(q% of n) — i.e.
    the true P_q rounded up to bin resolution; n is the key's non-NULL
    row count.

    Plan shape: one partial-aggregated shuffle onto (keys, bin) int
    rows; the cumulative window and the per-q min-bin reduction run over
    the histogram (O(value_range / bin_width) rows per key), never the
    corpus. `quantiles` are integer percents so the rank test
    `100*cum >= q*n` stays in exact int64 (no float ranks)."""
    if not quantiles or any(
        int(q) != q or not (0 < q <= 100) for q in quantiles
    ):
        raise ValueError(f"quantiles must be integer percents in (0,100]: {quantiles}")
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive: {bin_width}")
    kcols = list(keys)
    # FLOOR division, not DIV: Spark's DIV (and DuckDB's //) truncate
    # toward zero, which would give negative measures (e.g. a signed
    # contrast score) a double-width bin at 0 and upper edges off by up
    # to 2*bin_width. pmod keeps everything in exact int64.
    v = f"CAST({value_col} AS BIGINT)"
    floordiv = f"({v} - (({v} % {bin_width}) + {bin_width}) % {bin_width}) DIV {bin_width}"
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .select(*kcols, F.expr(floordiv).alias("bin"))
        .groupBy(*kcols, "bin")
        .agg(F.count("*").alias("cnt"))
    )
    w = (
        Window.partitionBy(*kcols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy(*kcols)
    cum = hist.select(
        *kcols,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    qdf = df.sparkSession.createDataFrame([(int(q),) for q in quantiles], "q int")
    return (
        cum.crossJoin(F.broadcast(qdf))
        .filter(F.lit(100) * F.col("cum") >= F.col("q") * F.col("n"))
        .groupBy(*kcols, "q")
        .agg(
            ((F.min("bin") + 1) * bin_width).alias("est"),
            F.max("n").alias("n"),
        )
    )
