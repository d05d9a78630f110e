"""Corpus mixing: deterministic budget-driven sampling per language /
domain / source — the stage that turns a deduplicated crawl into a
training mix ("X billion tokens of en, Y of de, ...").

Scale design:
- The keep/drop decision is a pure hash of (id, seed) — no RNG state, no
  sort, no window: re-running any partition (speculative retry, resume)
  makes the SAME decision, and adding executors cannot change the
  sample. That is the only sampling discipline that survives a
  1000-executor run (`df.sample` re-draws per task attempt).
- Rates come from ONE partial-aggregated groupBy over the key column
  (map-side combine; key cardinality is tiny), then return to the data
  as a BROADCAST join — the corpus itself is never reshuffled; the
  filter runs in the scan stage.
- The hash is the repo's standard md5 idiom (functions/hashing.py), so
  the DuckDB oracle reproduces every keep/drop decision bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.hashing import md5_field48

# 12 hex chars = 48 bits of md5 → uniform grid fine enough for any
# realistic rate; fits signed 64 with headroom
_DENOM = float(1 << 48)


def sample_uniform(id_col: str | Column, seed: int = 0) -> Column:
    """Deterministic uniform [0,1) from (id, seed): the first 48-bit md5
    field (functions.hashing.md5_field48). Identical expression exists in
    DuckDB ('0x'||substr(md5(..),1,12))::BIGINT — oracle parity."""
    return md5_field48(id_col, seed) / F.lit(_DENOM)


def budget_rates(
    df: DataFrame,
    budgets: dict[str, float],
    weight_col: str,
    key_col: str = "lang",
) -> DataFrame:
    """(key, rate) with rate = min(1, budget_key / total_weight_key).

    One tiny aggregate over the corpus; keys absent from `budgets` get
    rate 0.0 (explicitly excluded from the mix)."""
    spark = df.sparkSession
    bdf = spark.createDataFrame(
        [(k, float(v)) for k, v in budgets.items()], f"{key_col} string, budget double"
    )
    totals = df.groupBy(key_col).agg(F.sum(weight_col).alias("total"))
    return (
        totals.join(F.broadcast(bdf), key_col, "left")
        .select(
            key_col,
            F.when(F.col("budget").isNull(), F.lit(0.0))
            .otherwise(
                F.least(F.lit(1.0), F.col("budget") / F.col("total").cast("double"))
            )
            .alias("rate"),
        )
    )


def sample_corpus(
    df: DataFrame,
    rates: DataFrame,
    id_col: str = "doc_id",
    key_col: str = "lang",
    seed: int = 0,
) -> DataFrame:
    """Rows of `df` kept by the deterministic per-key Bernoulli: keep iff
    sample_uniform(id, seed) < rate(key). `rates` is broadcast — the
    corpus stays where it is."""
    return (
        df.join(F.broadcast(rates), key_col, "inner")
        .where(sample_uniform(id_col, seed) < F.col("rate"))
    )


def mix_corpus(
    df: DataFrame,
    budgets: dict[str, float],
    weight_col: str,
    id_col: str = "doc_id",
    key_col: str = "lang",
    seed: int = 0,
) -> DataFrame:
    """budget_rates + sample_corpus in one call: the Dolma-style "hit
    these per-language budgets" pass. Output carries `rate` so the mix
    is auditable."""
    rates = budget_rates(df, budgets, weight_col, key_col)
    return sample_corpus(df, rates, id_col, key_col, seed)
