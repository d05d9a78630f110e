"""Binned quantiles (operators/stats.py)."""

import pytest
from pyspark.sql import functions as F

from fuzzycat_spark.operators.stats import binned_quantiles


def _lengths(spark, rows):
    return spark.createDataFrame(rows, "lang string, n bigint")


def test_matches_exact_quantiles_up_to_bin_width(spark):
    import math

    vals = [7, 12, 55, 130, 260, 261, 400, 999, 1000, 2500]
    df = _lengths(spark, [("en", v) for v in vals])
    got = {
        r.q: (r.est, r.n)
        for r in binned_quantiles(
            df, "n", quantiles=(50, 90, 100), bin_width=100, keys=("lang",)
        ).collect()
    }
    for q, (est, n) in got.items():
        assert n == len(vals)
        # exact order statistic at rank ceil(q% of n)
        exact = sorted(vals)[math.ceil(q / 100 * len(vals)) - 1]
        # estimate is the bin upper edge containing the exact quantile
        assert est == (exact // 100 + 1) * 100


def test_per_key_independence(spark):
    df = _lengths(
        spark,
        [("short", v) for v in range(10, 20)]
        + [("long", v * 50) for v in range(1, 11)],
    )
    got = {
        (r.lang, r.q): r.est
        for r in binned_quantiles(
            df, "n", quantiles=(50,), bin_width=10, keys=("lang",)
        ).collect()
    }
    assert got[("short", 50)] == 20   # values 10..19 -> P50 in bin [10,20)
    assert got[("long", 50)] == 260   # 50,100,...,500 -> P50=250 -> edge 260


def test_nulls_excluded_and_no_keys(spark):
    df = spark.createDataFrame(
        [(v,) for v in [5, 15, 25, None]], "n bigint"
    )
    got = {r.q: (r.est, r.n) for r in
           binned_quantiles(df, "n", quantiles=(100,), bin_width=10).collect()}
    assert got[100] == (30, 3)


def test_rejects_bad_params(spark):
    df = _lengths(spark, [("en", 1)])
    with pytest.raises(ValueError, match="quantiles"):
        binned_quantiles(df, "n", quantiles=(0,))
    with pytest.raises(ValueError, match="bin_width"):
        binned_quantiles(df, "n", bin_width=0)


def test_histogram_plan_is_partial_agg_no_value_sort(spark):
    """The corpus-side shuffle is the (keys, bin) partial agg; no global
    sort of the measure column ever appears."""
    df = _lengths(spark, [("en", v) for v in range(200)])
    plan = (
        binned_quantiles(df, "n", keys=("lang",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial" in plan.lower()
    # window/sort runs over (lang, bin) histogram rows only
    for line in plan.splitlines():
        if "Sort " in line and "bin" not in line:
            assert "n#" not in line.split("Sort")[1].split("],")[0], line


def test_negative_values_bin_by_floor_division(spark):
    """Signed measures (e.g. contrast scores) bin correctly: the upper
    edge never overshoots by more than bin_width."""
    import math

    vals = [-250, -101, -100, -99, -1, 0, 99, 100, 250]
    df = spark.createDataFrame([(v,) for v in vals], "n bigint")
    got = {r.q: r.est for r in
           binned_quantiles(df, "n", quantiles=(10, 50, 100),
                            bin_width=100).collect()}
    for q, est in got.items():
        exact = sorted(vals)[math.ceil(q / 100 * len(vals)) - 1]
        assert est == (exact - (exact % 100 + 100) % 100) + 100, (q, est, exact)


def test_rejects_non_integer_quantiles(spark):
    df = spark.createDataFrame([(1,)], "n bigint")
    with pytest.raises(ValueError, match="integer percents"):
        binned_quantiles(df, "n", quantiles=(99.9,))
