"""Corpus mixing (operators/mixing.py): deterministic budget sampling.

The properties that matter at cluster scale: the keep/drop decision is a
pure function of (id, seed) — invariant under repartitioning and retries
— rates clip to [0,1], keys without a budget are excluded, and the
sampled weight tracks the budget. Plan: rates return via broadcast join,
the corpus side is never exchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuzzycat_spark.operators.mixing import (
    budget_rates,
    mix_corpus,
    sample_corpus,
    sample_uniform,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, lang, 100 + (i % 7) * 10)
        for i, lang in enumerate(
            ["en"] * 400 + ["de"] * 200 + ["zh"] * 100 + ["fr"] * 50
        )
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


BUDGETS = {"en": 20000.0, "de": 5000.0, "zh": 1_000_000.0}


class TestRates:
    def test_rates_clip_and_exclude(self, spark, corpus):
        rates = {
            r["lang"]: r["rate"]
            for r in budget_rates(corpus, BUDGETS, "n_chars").collect()
        }
        assert rates["zh"] == 1.0  # budget >> total → clipped
        assert rates["fr"] == 0.0  # no budget → excluded
        assert 0.0 < rates["en"] < 1.0
        assert 0.0 < rates["de"] < 1.0
        # rate is exactly budget/total for the partial keys
        total_en = sum(100 + (i % 7) * 10 for i in range(400))
        assert rates["en"] == pytest.approx(20000.0 / total_en, abs=0)


class TestSampling:
    def test_deterministic_and_partition_invariant(self, spark, corpus):
        rates = budget_rates(corpus, BUDGETS, "n_chars")
        a = sorted(
            r["doc_id"] for r in sample_corpus(corpus, rates, seed=3).collect()
        )
        b = sorted(
            r["doc_id"]
            for r in sample_corpus(corpus.repartition(13), rates, seed=3).collect()
        )
        assert a == b and len(a) > 0

    def test_budget_adherence(self, spark, corpus):
        out = mix_corpus(corpus, BUDGETS, "n_chars", seed=0)
        kept = {
            r["lang"]: r["w"]
            for r in out.groupBy("lang").agg(F.sum("n_chars").alias("w")).collect()
        }
        # zh clipped: everything kept
        assert kept["zh"] == sum(100 + (i % 7) * 10 for i in range(600, 700))
        assert "fr" not in kept
        # Bernoulli at n=400/200 docs: expect within ~25% of budget
        assert kept["en"] == pytest.approx(20000.0, rel=0.25)
        assert kept["de"] == pytest.approx(5000.0, rel=0.25)

    def test_seed_changes_sample_not_size_class(self, spark, corpus):
        rates = budget_rates(corpus, BUDGETS, "n_chars")
        s0 = {r["doc_id"] for r in sample_corpus(corpus, rates, seed=0).collect()}
        s1 = {r["doc_id"] for r in sample_corpus(corpus, rates, seed=1).collect()}
        assert s0 != s1

    def test_uniform_matches_python_md5(self, spark):
        import hashlib

        df = spark.range(20).select(
            F.col("id").alias("doc_id"), sample_uniform("doc_id", seed=9).alias("u")
        )
        for r in df.collect():
            h = int(
                hashlib.md5(f"{r['doc_id']}:9".encode()).hexdigest()[:12], 16
            )
            assert r["u"] == h / float(1 << 48)


class TestPlan:
    def test_rates_join_is_broadcast_no_corpus_exchange(self, spark, corpus):
        rates = budget_rates(corpus, BUDGETS, "n_chars")
        plan = sample_corpus(corpus, rates)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # the only exchanges feed the tiny rates aggregate / broadcast,
        # never a full-corpus shuffle: no SortMergeJoin anywhere
        assert "SortMergeJoin" not in plan


def test_assign_splits_deterministic_disjoint_exhaustive(spark):
    from fuzzycat_spark.operators.mixing import assign_splits

    docs = spark.createDataFrame(
        [(i,) for i in range(2000)], "doc_id bigint"
    )
    out = assign_splits(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                        seed=7)
    got = {r.doc_id: r.split for r in out.collect()}
    # exhaustive when fractions sum to 1 (last bound pinned to 2^48)
    assert None not in got.values()
    counts = {s: list(got.values()).count(s) for s in ("train", "val", "test")}
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert 0.07 < counts["val"] / 2000 < 0.13
    # invariant under repartition and re-run
    again = {
        r.doc_id: r.split
        for r in assign_splits(
            docs.repartition(17), {"train": 0.8, "val": 0.1, "test": 0.1},
            seed=7,
        ).collect()
    }
    assert got == again
    # a different seed reshuffles membership
    other = {
        r.doc_id: r.split
        for r in assign_splits(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=8
        ).collect()
    }
    assert got != other


def test_assign_splits_by_cluster_no_straddle_and_singleton_compat(spark):
    from fuzzycat_spark.operators.mixing import (
        assign_splits,
        assign_splits_by_cluster,
    )

    fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = spark.createDataFrame([(i,) for i in range(600)], "doc_id bigint")
    # docs 0..299 clustered in 3-member families labeled by min id;
    # docs 300..599 absent from assignments (singletons)
    assignments = spark.createDataFrame(
        [(i, (i // 3) * 3) for i in range(300)], "id bigint, cluster_id bigint"
    )
    out = assign_splits_by_cluster(
        docs, assignments, fractions, seed=7
    ).collect()
    assert len(out) == 600
    by_cluster: dict[int, set] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    # the leakage property: every cluster lands wholly in ONE split
    assert all(len(s) == 1 for s in by_cluster.values())
    # all 3 members of each family share the family's split
    fam = {r.doc_id: r.split for r in out if r.doc_id < 300}
    for i in range(0, 300, 3):
        assert fam[i] == fam[i + 1] == fam[i + 2]
    # singletons fall back to their own id: bit-identical to the plain
    # doc-level assign_splits at the same seed
    plain = {
        r.doc_id: r.split
        for r in assign_splits(docs, fractions, seed=7).collect()
    }
    for r in out:
        if r.doc_id >= 300:
            assert r.cluster_id == r.doc_id
            assert r.split == plain[r.doc_id]
    # a near-copy pair CAN straddle under doc-level hashing somewhere in
    # this corpus (the contamination the cluster routing removes)
    assert any(
        plain[i] != plain[i + 1] or plain[i] != plain[i + 2]
        for i in range(0, 300, 3)
    )


def test_assign_splits_shortfall_leaves_null_and_validates(spark):
    import pytest as _pytest

    from fuzzycat_spark.operators.mixing import assign_splits

    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id bigint")
    out = assign_splits(docs, {"train": 0.5}, seed=1).collect()
    splits = {r.split for r in out}
    assert splits == {"train", None}
    with _pytest.raises(ValueError):
        assign_splits(docs, {"a": 0.9, "b": 0.2})


class TestSampleQuota:
    QUOTAS = {"en": 25, "de": 10, "zh": 1_000}

    def test_exact_counts_and_arms(self, spark, corpus):
        from fuzzycat_spark.operators.mixing import sample_quota

        out = sample_quota(corpus, self.QUOTAS, seed=3).collect()
        by_key = {}
        for r in out:
            by_key.setdefault(r["lang"], []).append((r["rank"], r["id"]))
        # capped strata hit the quota exactly
        assert len(by_key["en"]) == 25
        assert len(by_key["de"]) == 10
        # quota above stratum size keeps everything
        assert len(by_key["zh"]) == 100
        # strata without a quota are dropped
        assert "fr" not in by_key
        # ranks are contiguous 1..n per stratum
        for k, rows in by_key.items():
            assert sorted(r for r, _ in rows) == list(range(1, len(rows) + 1))

    def test_matches_naive_window_and_partition_invariant(self, spark, corpus):
        from pyspark.sql import Window

        from fuzzycat_spark.functions.hashing import md5_field48
        from fuzzycat_spark.operators.mixing import sample_quota

        got = {
            (r["id"], r["lang"], r["rank"])
            for r in sample_quota(corpus, self.QUOTAS, seed=3, salt=4).collect()
        }
        # the salted two-stage result equals one naive global window
        w = Window.partitionBy("lang").orderBy(
            md5_field48("doc_id", 3).asc(), F.col("doc_id").asc()
        )
        naive = {
            (r["doc_id"], r["lang"], r["rank"])
            for r in corpus.filter(F.col("lang").isin(*self.QUOTAS))
            .withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(
                F.col("rank")
                <= F.when(F.col("lang") == "en", 25)
                .when(F.col("lang") == "de", 10)
                .otherwise(1_000)
            )
            .collect()
        }
        assert got == naive
        # invariant under input repartitioning
        again = {
            (r["id"], r["lang"], r["rank"])
            for r in sample_quota(
                corpus.repartition(13), self.QUOTAS, seed=3
            ).collect()
        }
        assert got == again

    def test_seed_changes_selection(self, spark, corpus):
        from fuzzycat_spark.operators.mixing import sample_quota

        a = {r["id"] for r in sample_quota(corpus, {"en": 25}, seed=3).collect()}
        b = {r["id"] for r in sample_quota(corpus, {"en": 25}, seed=4).collect()}
        assert len(a) == len(b) == 25
        assert a != b

    def test_quotas_broadcast_corpus_not_exchanged_before_stage1(self, spark, corpus):
        from fuzzycat_spark.operators.mixing import sample_quota

        plan = (
            sample_quota(corpus, self.QUOTAS, seed=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan


def test_sqrt_temperature_flattens_toward_tail(spark):
    from fuzzycat_spark.operators.mixing import (
        sample_corpus,
        sqrt_temperature_rates,
    )

    rows = [(i, "big") for i in range(900)] + [
        (900 + i, "small") for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    rates = {r.lang: r.rate for r in
             sqrt_temperature_rates(df, budget=500).collect()}
    # sqrt weights 30:10 -> big expects 375 of 900 (rate ~.4167),
    # small expects 125 of 100 -> clamps to 1
    assert rates["small"] == 1.0
    assert abs(rates["big"] - 500 * (30 / 40) / 900) < 1e-9
    kept = sample_corpus(
        df, sqrt_temperature_rates(df, budget=500), key_col="lang", seed=7
    )
    by = {r[0]: r[1] for r in kept.groupBy("lang").count().collect()}
    assert by["small"] == 100          # clamped arm keeps everything
    assert 300 < by["big"] < 450       # Bernoulli around 375
    # tail share rose vs proportional: 100/475ish >> 10%
    assert by["small"] / (by["small"] + by["big"]) > 0.2


def test_sqrt_temperature_rates_deterministic_and_bounded(spark):
    from fuzzycat_spark.operators.mixing import sqrt_temperature_rates

    rows = [(i, f"l{i % 7}") for i in range(350)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    a = sorted(map(tuple, sqrt_temperature_rates(df, 100).collect()))
    b = sorted(map(tuple, sqrt_temperature_rates(df, 100).collect()))
    assert a == b
    assert all(0.0 < r <= 1.0 for _, r in a)
    # equal-sized keys get identical rates
    assert len({r for _, r in a}) == 1


def test_assign_splits_rejects_nonpositive_fractions(spark):
    import pytest as _pytest

    from fuzzycat_spark.operators.mixing import assign_splits

    df = spark.createDataFrame([(1,)], "doc_id bigint")
    with _pytest.raises(ValueError, match="positive"):
        assign_splits(df, {"train": 0.5, "test": -0.1})
    with _pytest.raises(ValueError, match="positive"):
        assign_splits(df, {"train": -0.2, "val": 1.2})


def test_assign_splits_by_cluster_accepts_docs_carrying_cluster_id(spark):
    """Post-dedup corpora already have a cluster_id column; the
    assignments side is authoritative and the docs-side copy must not
    raise an ambiguous-reference error."""
    from fuzzycat_spark.operators.mixing import assign_splits_by_cluster

    docs = spark.createDataFrame(
        [(1, 999), (2, 999), (3, 888)],
        "doc_id bigint, cluster_id bigint",  # stale docs-side labels
    )
    assignments = spark.createDataFrame(
        [(1, 1), (2, 1)], "id bigint, cluster_id bigint"
    )
    out = assign_splits_by_cluster(
        docs, assignments, {"train": 0.5, "test": 0.5}, seed=3
    ).collect()
    labels = {r.doc_id: r.cluster_id for r in out}
    # authoritative assignments win; absent doc falls back to its own id
    assert labels == {1: 1, 2: 1, 3: 3}
    splits = {r.doc_id: r.split for r in out}
    assert splits[1] == splits[2]


class TestTokenBudgetSelect:
    def _run(self, spark, rows, budgets, **kw):
        from fuzzycat_spark.operators.mixing import token_budget_select

        df = spark.createDataFrame(
            rows, "doc_id string, lang string, n_tokens long, score long"
        )
        out = token_budget_select(df, budgets, score_col="score", **kw)
        return {r.id: r for r in out.collect()}

    def test_whole_bin_keep_and_cut(self, spark):
        rows = [("a", "en", 10, 9), ("b", "en", 10, 8), ("c", "en", 10, 7)]
        got = self._run(spark, rows, {"en": 20})
        assert got["a"].kept and got["a"].status == "full"
        assert got["b"].kept and got["b"].status == "full"
        assert not got["c"].kept and got["c"].status == "cut"

    def test_boundary_prefix_fits_budget(self, spark):
        # one bin of 5 docs x 10 tokens, budget 25 -> exactly 2 admitted
        rows = [(f"d{i}", "en", 10, 5) for i in range(5)]
        got = self._run(spark, rows, {"en": 25})
        kept = [r for r in got.values() if r.kept]
        assert len(kept) == 2
        assert all(r.status == "boundary" for r in got.values())

    def test_absent_key_all_cut(self, spark):
        got = self._run(spark, [("a", "xx", 5, 1)], {"en": 100})
        assert not got["a"].kept and got["a"].status == "cut"

    def test_determinism_and_monotone_budget(self, spark):
        rows = [(f"d{i}", "en", 3 + (i % 4), 50 - i // 7) for i in range(40)]
        a = self._run(spark, rows, {"en": 60})
        b = self._run(spark, rows, {"en": 60})
        assert {k: r.kept for k, r in a.items()} == {
            k: r.kept for k, r in b.items()
        }
        bigger = self._run(spark, rows, {"en": 90})
        # growing the budget never evicts a previously kept doc
        for k, r in a.items():
            if r.kept:
                assert bigger[k].kept

    def test_total_never_exceeds_budget(self, spark):
        rows = [(f"d{i}", "en", 7, 5) for i in range(30)]
        got = self._run(spark, rows, {"en": 100})
        assert sum(r.w for r in got.values() if r.kept) <= 100

    def test_null_key_or_score_reported_invalid(self, spark):
        from fuzzycat_spark.operators.mixing import token_budget_select

        df = spark.createDataFrame(
            [("a", "en", 10, 9), ("b", None, 10, 9), ("c", "en", 10, None)],
            "doc_id string, lang string, n_tokens long, score long",
        )
        out = token_budget_select(df, {"en": 100}, score_col="score")
        got = {r.id: r for r in out.collect()}
        assert len(got) == 3  # nothing silently dropped
        assert got["a"].kept is True
        for k in ("b", "c"):
            assert got[k].kept is False and got[k].status == "invalid"
