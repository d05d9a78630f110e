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

from pyspark.sql import Column, DataFrame, Window
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


def assign_splits(
    docs: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic train/val/test (or any named) split assignment:
    `docs` plus a `split` column, each document routed by where its
    48-bit md5 draw lands in the cumulative fraction grid.

    Same discipline as the mixing sampler: the split is a pure hash of
    (id, seed) — partition-, retry-, and cluster-size-invariant, and a
    document can never change split between runs (the property held-out
    eval sets actually require; `df.randomSplit` re-draws per task
    attempt). Fraction boundaries are compared on the INTEGER grid so
    any engine reproduces every assignment exactly. Fractions must sum
    to <= 1 (+epsilon); a shortfall leaves the remainder NULL (callers
    can treat NULL as "unassigned/discard")."""
    total = sum(fractions.values())
    if not fractions or total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total}, must be in (0, 1]")
    if any(f <= 0 for f in fractions.values()):
        # a negative fraction would pass the sum check but produce a
        # non-monotonic bound grid: its split becomes unreachable and
        # the shortfall lands silently in the preceding split
        raise ValueError(f"every fraction must be positive: {fractions}")
    field = md5_field48(id_col, seed)
    expr: Column | None = None
    for name, bound in split_bounds(fractions):
        expr = (
            F.when(field < F.lit(bound), F.lit(name))
            if expr is None
            else expr.when(field < F.lit(bound), F.lit(name))
        )
    return docs.withColumn("split", expr)


def assign_splits_by_cluster(
    docs: DataFrame,
    assignments: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    assign_id_col: str = "id",
    seed: int = 0,
) -> DataFrame:
    """Leakage-safe train/val/test assignment: route every document by
    the md5 draw of its DEDUP CLUSTER, not its own id, so near-duplicate
    documents can never straddle a split boundary. Doc-level hashing
    (`assign_splits`) puts a train document's near-copy into the test
    set with probability (1 - train_fraction) per duplicate — exactly
    the contamination the dedup pipeline exists to prevent; routing by
    cluster pins the whole family to one side. It also makes splits
    stable across reruns that pick a different canonical representative:
    the cluster label (min member id) moves only when the cluster itself
    changes, the representative choice never does.

    `assignments` is (assign_id_col, cluster_col) — the output of
    `connected_components` / `dedup_pages`. Documents absent from it are
    singletons and fall back to their own id, which makes this function
    bit-compatible with `assign_splits` at the same seed for every
    unclustered document.

    Scale: ONE equi join on the doc id (at most one assignment row per
    doc; exchange-free when both sides are bucketed by id) plus the same
    pure-hash routing as `assign_splits` — no window, no sort, no RNG
    state, so task retries and cluster resizes cannot move a document
    between splits. Returns `docs` + (cluster_col, split).
    """
    a = assignments.select(
        F.col(assign_id_col).alias(id_col), F.col(cluster_col)
    )
    # post-dedup corpora already carry a cluster_id column (dedup_pages /
    # select_canonical output) — the assignments side is authoritative, so
    # drop the docs-side copy instead of producing an ambiguous reference
    joined = docs.drop(cluster_col).join(a, id_col, "left").withColumn(
        cluster_col, F.coalesce(F.col(cluster_col), F.col(id_col))
    )
    return assign_splits(joined, fractions, id_col=cluster_col, seed=seed)


def split_bounds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bound on the 48-bit grid) per split, in
    insertion order — the exact integers `assign_splits` compares
    against, exposed so an oracle can replicate every boundary
    bit-for-bit (IEEE accumulation included). When the fractions sum to
    1 within 1e-9 the last bound is pinned to 2^48 exactly, so no
    2^-48 sliver of ids is left unassigned by float rounding."""
    out = []
    acc = 0.0
    names = list(fractions)
    for name in names:
        acc += fractions[name]
        out.append((name, int(acc * (1 << 48))))
    if abs(sum(fractions.values()) - 1.0) < 1e-9:
        out[-1] = (names[-1], 1 << 48)
    return out


def sample_quota(
    df: DataFrame,
    quotas: dict[str, int],
    id_col: str = "doc_id",
    key_col: str = "lang",
    seed: int = 0,
    salt: int = 16,
) -> DataFrame:
    """Exact-count stratified sample: for each stratum key, keep the
    `quotas[key]` documents with the SMALLEST 48-bit md5 draw (ties by
    id), ranked 1..quota. Strata absent from `quotas` are dropped.
    Returns (id, key, rank).

    The rate-based sampler (`sample_corpus`) hits a budget only in
    expectation; this is the "exactly 10M German documents" form a
    training-mix spec usually states. Selection is still a pure function
    of (id, seed) ORDER — re-running, resuming, or resizing the cluster
    reproduces the identical sample, and a document entering/leaving the
    corpus displaces at most one other document per stratum.

    Scale: a naive per-stratum window would put an entire language on
    one reducer. Instead the same two-stage salted top-k as
    `operators/retrieval.py`: stage 1 ranks within (key, xxhash64(id) %
    salt) — `salt` x key-cardinality balanced partitions — and keeps
    quota rows per salt cell; stage 2 ranks the <= quota*salt survivors
    per key. Top-quota of a union of per-cell top-quotas is exactly the
    global top-quota, so the result is identical to the naive window.
    Quotas ride a broadcast join; the corpus is never reshuffled."""
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(k, int(v)) for k, v in quotas.items()], f"{key_col} string, quota bigint"
    )
    hv = md5_field48(id_col, seed)
    scored = df.join(F.broadcast(qdf), key_col, "inner").select(
        F.col(id_col).alias("id"), F.col(key_col).alias("key"), "quota",
        hv.alias("_hv"),
    )
    order = [F.col("_hv").asc(), F.col("id").asc()]
    pre = Window.partitionBy("key", F.pmod(F.xxhash64("id"), F.lit(salt))).orderBy(
        *order
    )
    survivors = (
        scored.withColumn("_r", F.row_number().over(pre))
        .filter(F.col("_r") <= F.col("quota"))
        .drop("_r")
    )
    final = Window.partitionBy("key").orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= F.col("quota"))
        .select("id", F.col("key").alias(key_col), F.col("rank").cast("long").alias("rank"))
    )


def sqrt_temperature_rates(
    df: DataFrame,
    budget: float,
    key_col: str = "lang",
) -> DataFrame:
    """(key, rate): square-root temperature flattening — each key's
    expected share of `budget` docs is proportional to sqrt(n_key)
    (the T=2 / alpha=0.5 point of the UniMax/mT5 n^alpha sampling
    family), so head languages/domains are damped and tail ones
    up-weighted RELATIVE to proportional sampling without ever
    up-SAMPLING (rates clamp at 1; actual duplication belongs to shard
    assembly, not the sampler). rate_key = min(1, budget*sqrt(n_key) /
    (sum_sqrt * n_key)).

    Determinism: sqrt is IEEE-correctly-rounded in both engines, the
    per-key weight is floored to an integer at 1e6 scale, the weight sum
    is an exact int64, and the final rate is two IEEE multiplies and one
    divide mirrored op-for-op in the oracle — bit-identical rates, hence
    bit-identical keep sets through `sample_corpus`. Other temperatures
    need pow(), which is NOT correctly rounded across engines — feed
    externally-computed rates to `sample_corpus`/`budget_rates` instead.

    One tiny partial-aggregated count per key + a 1-row sum; the corpus
    is never reshuffled (rates return as a broadcast)."""
    counts = df.groupBy(key_col).agg(F.count("*").alias("n"))
    sq = counts.select(
        key_col,
        "n",
        F.floor(F.sqrt(F.col("n").cast("double")) * 1000000.0).alias("sq"),
    )
    tot = sq.agg(F.sum("sq").alias("s"))
    return sq.crossJoin(F.broadcast(tot)).select(
        key_col,
        F.least(
            F.lit(1.0),
            (F.lit(float(budget)) * F.col("sq").cast("double"))
            / (F.col("s").cast("double") * F.col("n").cast("double")),
        ).alias("rate"),
    )


def token_budget_select(
    df: DataFrame,
    budgets: dict[str, int],
    weight_col: str = "n_tokens",
    score_col: str = "score",
    key_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Ranked token-budget selection: per key, keep the HIGHEST-scoring
    documents until their token weights fill `budgets[key]` — the "best
    1B tokens per language" form a training-mix spec states when quality
    ranking (not a uniform draw) should decide who makes the cut.
    Returns (id, key, w, s, kept, status), status in
    full/boundary/cut/invalid (invalid = NULL key or score: never kept,
    but never silently dropped either).

    `score_col` must be an INTEGER score (fixed-point-quantize floats
    first, like every exact ranking in this repo): equal scores form one
    bin, so cross-engine float ordering never decides membership.

    Semantics: score bins sort descending per key; bins whose cumulative
    weight fits the budget are kept whole ('full'); bins past it are
    dropped whole ('cut'); the ONE bin straddling the budget
    ('boundary') admits documents in deterministic (md5(id, seed), id)
    order while the running total still fits — weights are positive so
    the running total is monotone and the kept set is a prefix. A
    rerun, resume, or cluster resize reproduces the identical set;
    adding/removing a document only perturbs its own bin.

    Scale: one corpus shuffle to (key, score) bins — a table of
    keys x distinct-scores rows, so the cumulative window runs over the
    TINY bin table, never the corpus. Budgets ride a broadcast. The
    corpus pays one join back on (key, score) and ONLY boundary-bin
    rows enter the admission window: with scores quantized to ~1e4
    steps a boundary bin is ~1e-4 of a key's rows. Degenerate scoring
    (every doc the same score) collapses to one bin = one window
    partition — quantize finer, or fall back to `sample_quota`, if a
    key's score column can be constant at corpus scale."""
    allrows = df.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("key"),
        F.col(weight_col).cast("long").alias("w"),
        F.col(score_col).cast("long").alias("s"),
    )
    # NULL keys/scores can never join back onto a bin (null != null in an
    # equi-join) — report them as 'invalid' instead of dropping them
    valid = F.col("key").isNotNull() & F.col("s").isNotNull()
    rows = allrows.filter(valid)
    invalid = allrows.filter(~valid).select(
        "id", "key", "w", "s", F.lit(False).alias("kept"),
        F.lit("invalid").alias("status"),
    )
    bdf = df.sparkSession.createDataFrame(
        [(k, int(v)) for k, v in budgets.items()], "key string, budget bigint"
    )
    wb = Window.partitionBy("key").orderBy(F.col("s").desc())
    bins = (
        rows.groupBy("key", "s")
        .agg(F.sum("w").alias("_bw"))
        .withColumn("_cum", F.sum("_bw").over(wb))
        .withColumn("_prev", F.col("_cum") - F.col("_bw"))
        .join(F.broadcast(bdf), "key", "left")
        .withColumn("budget", F.coalesce("budget", F.lit(0)))
        .withColumn(
            "status",
            F.when(F.col("_cum") <= F.col("budget"), F.lit("full"))
            .when(F.col("_prev") >= F.col("budget"), F.lit("cut"))
            .otherwise(F.lit("boundary")),
        )
    )
    labeled = rows.join(
        bins.select("key", "s", "_prev", "budget", "status"), ["key", "s"]
    )
    out_cols = ["id", "key", "w", "s", "kept", "status"]
    # whole-bin verdicts never touch a window; ONLY the straddling bin's
    # rows pay the admission shuffle
    settled = labeled.filter(F.col("status") != "boundary").select(
        "id", "key", "w", "s",
        (F.col("status") == "full").alias("kept"), "status",
    )
    wr = Window.partitionBy("key", "s").orderBy(
        md5_field48("id", seed).asc(), F.col("id").asc()
    )
    run = F.col("_prev") + F.sum("w").over(
        wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    edge = (
        labeled.filter(F.col("status") == "boundary")
        .withColumn("kept", run <= F.col("budget"))
        .select(*out_cols)
    )
    return settled.unionByName(edge).unionByName(invalid)
