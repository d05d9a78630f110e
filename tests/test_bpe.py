"""BPE tokenizer training (operators/bpe.py): learned merge sequences
match an independent pure-Python reference implementing the documented
padded-replace semantics, the same-pair-run deviation behaves exactly as
documented, exhausted corpora degrade to no-ops instead of wiping the
word table, token counts read off the trained table, and the argmax is
planned as TakeOrderedAndProject (never a global sort)."""

from __future__ import annotations

from collections import Counter

from fuzzycat_spark.operators.bpe import (
    bpe_token_counts,
    bpe_train,
    bpe_word_table,
)


def _py_bpe(texts: list[str], n_merges: int):
    """Independent reference: same documented semantics (naive adjacent
    pair counts, (count DESC, left ASC, right ASC) argmax, single-pass
    space-padded str.replace application)."""
    words = Counter(w for t in texts for w in t.split())
    syms = {w: " ".join(w) for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        pairs: Counter = Counter()
        for w, f in words.items():
            s = syms[w].split(" ")
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        (l, r), c = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, l + r, c))
        for w in syms:
            syms[w] = (
                f" {syms[w]} ".replace(f" {l} {r} ", f" {l}{r} ").strip()
            )
    return merges, syms, words


def _train(spark, texts, n_merges, **kw):
    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(texts)], "id string, text string"
    )
    w = bpe_word_table(df, **kw)
    merges, final = bpe_train(w, n_merges)
    return df, merges, final


SENNRICH = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest widest",
]


def test_merges_match_python_reference(spark):
    _, merges, final = _train(spark, SENNRICH, 6)
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in merges.orderBy("step").collect()
    ]
    exp_merges, exp_syms, _ = _py_bpe(SENNRICH, 6)
    assert got == exp_merges
    # classic corpus learns 'est' pieces first (sanity on the semantics,
    # not just self-consistency)
    assert got[0][:2] == (1, "e") and got[0][3] == "es"
    assert {r.word: r.syms for r in final.collect()} == exp_syms


def test_same_pair_run_merges_one_per_round_as_documented(spark):
    _, merges, final = _train(spark, ["aaaa"], 3)
    got = [(r.step, r.left, r.right, r.pair_count) for r in merges.collect()]
    # round 1: (a,a) x3 naive count; padded replace leaves 'aa a a'
    # round 2: (aa,a) and (a,a) tie at 1 -> left-asc tiebreak picks (a,a)
    # round 3: only (aa,aa) remains
    assert got == [(1, "a", "a", 3), (2, "a", "a", 1), (3, "aa", "aa", 1)]
    assert final.collect()[0].syms == "aaaa"


def test_exhausted_corpus_is_a_noop_not_a_wipe(spark):
    _, merges, final = _train(spark, ["ab ab cd"], 5)
    got = [(r.step, r.merged) for r in merges.orderBy("step").collect()]
    # round 1 merges (a,b); round 2 merges (c,d); rounds 3-5 have no
    # pairs left -> no merge rows, word table intact
    assert got == [(1, "ab"), (2, "cd")]
    rows = {r.word: r.syms for r in final.collect()}
    assert rows == {"ab": "ab", "cd": "cd"}


def test_word_pattern_restricts_vocabulary(spark):
    df, merges, final = _train(
        spark, ["abc abc ábc ábc ábc"], 1, word_pattern="^[!-~]+$"
    )
    assert {r.word for r in final.collect()} == {"abc"}
    # the non-ASCII word's (higher-frequency) pairs never compete
    assert merges.collect()[0].pair_count == 2


def test_token_counts_read_off_trained_table(spark):
    texts = ["low low lower", "newest widest", "", "xyz"]
    df, merges, final = _train(spark, SENNRICH + texts, 6)
    counts = {
        r.id: r.n_tokens_bpe
        for r in bpe_token_counts(df, final).collect()
        if int(r.id) >= len(SENNRICH)
    }
    _, exp_syms, _ = _py_bpe(SENNRICH + texts, 6)
    exp = {
        str(i + len(SENNRICH)): sum(
            len(exp_syms[w].split(" ")) for w in t.split()
        )
        for i, t in enumerate(texts)
    }
    assert counts == exp
    assert counts[str(len(SENNRICH) + 2)] == 0  # empty doc reports 0


def test_apply_matches_trained_table_and_segments_unseen_words(spark):
    from fuzzycat_spark.operators.bpe import bpe_apply

    df, merges_df, final = _train(spark, SENNRICH, 6)
    merges = [(r.left, r.right) for r in merges_df.orderBy("step").collect()]
    # on the training corpus the replace fold reproduces the trained
    # table's segmentation exactly
    a = {r.id: r.n_tokens_bpe for r in bpe_apply(df, merges).collect()}
    b = {r.id: r.n_tokens_bpe for r in bpe_token_counts(df, final).collect()}
    assert a == b

    def fold(word):
        s = " " + " ".join(word) + " "
        for l, r in merges:
            s = s.replace(f" {l} {r} ", f" {l}{r} ")
        return len(s.strip().split(" "))

    unseen = ["lowest newer", "zzz est", ""]
    udf = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(unseen)], "id string, text string"
    )
    got = {r.id: r.n_tokens_bpe for r in bpe_apply(udf, merges).collect()}
    exp = {
        str(i): sum(fold(w) for w in t.split())
        for i, t in enumerate(unseen)
    }
    assert got == exp and got["2"] == 0
    # 'est' was learned from SENNRICH, so the unseen words compress
    assert got["0"] < sum(len(w) for w in unseen[0].split())


def test_checkpointer_variant_matches_lazy(spark, tmp_path):
    from fuzzycat_spark.plans.checkpoint import StageCheckpointer

    df = spark.createDataFrame(
        [(str(i), t) for i, t in enumerate(SENNRICH)], "id string, text string"
    )
    w = bpe_word_table(df)
    lazy_m, lazy_f = bpe_train(w, 4)
    ck = StageCheckpointer(spark, str(tmp_path / "bpe_ck"))
    ck_m, ck_f = bpe_train(w, 4, checkpointer=ck)
    assert sorted(map(tuple, ck_m.collect())) == sorted(
        map(tuple, lazy_m.collect())
    )
    assert sorted(map(tuple, ck_f.collect())) == sorted(
        map(tuple, lazy_f.collect())
    )


def test_argmax_plans_as_take_ordered_not_global_sort(spark):
    # the round-6 per-round materialization means the terminal merges
    # plan only reads the argmax parquet; the plan under test is the
    # argmax frame the materialize job executes
    from fuzzycat_spark.operators.bpe import _round_argmax

    df = spark.createDataFrame([("0", "low lower")], "id string, text string")
    best = _round_argmax(bpe_word_table(df))
    plan = best._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
