"""Decontamination (`operators/decontaminate.py`): exact n-gram leak
detection against a broadcast eval suite — semantics plus the
no-corpus-shuffle plan property."""

from __future__ import annotations

from pyspark.sql import functions as F

from fuzzycat_spark.operators.decontaminate import decontaminate, eval_ngrams


def _dfs(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "The QUICK, brown fox JUMPS over nothing at all"),  # leak, case/punct
            (3, "completely unrelated text about tidal records"),
            (4, "fox jumps over the lazy"),  # exactly one 5-gram, leaked
            (5, ""),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(0, "the quick brown fox jumps over a fence"), (1, "short one")],
        "eval_id long, text string",
    )
    return docs, ev


def test_decontaminate_counts_distinct_leaked_grams(spark):
    docs, ev = _dfs(spark)
    out = {r.doc_id: r for r in decontaminate(docs, ev, n=5).collect()}
    # doc 1 shares "the quick brown fox jumps" and "quick brown fox jumps
    # over" with eval prompt 0
    assert out[1].n_eval_grams_hit == 2 and out[1].contaminated
    # slug tokenization: case and punctuation do not hide the leak
    assert out[2].n_eval_grams_hit == 2 and out[2].contaminated
    assert out[3].n_eval_grams_hit == 0 and not out[3].contaminated
    # doc 4 has a single whole-run gram "fox jumps over the lazy",
    # which eval prompt 0 does NOT contain as a 5-gram
    assert out[4].n_eval_grams_hit == 0
    assert out[5].n_eval_grams_hit == 0
    assert len(out) == 5


def test_short_eval_prompt_matches_whole_run(spark):
    docs = spark.createDataFrame(
        [(1, "prefix short one suffix")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(0, "short one")], "eval_id long, text string")
    # eval prompt shorter than n becomes a whole-run gram; the doc's
    # 5-grams never equal a 2-token gram -> no hit (exact n-gram match,
    # not substring)
    out = decontaminate(docs, ev, n=5).collect()[0]
    assert out.n_eval_grams_hit == 0
    # but a doc that IS that short matches
    tiny = spark.createDataFrame([(2, "short one")], "doc_id long, text string")
    assert decontaminate(tiny, ev, n=5).collect()[0].contaminated


def test_eval_grams_distinct(spark):
    ev = spark.createDataFrame(
        [(0, "a b c d e a b c d e")], "eval_id long, text string"
    )
    grams = {r.gram for r in eval_ngrams(ev, n=5).collect()}
    assert "a b c d e" in grams


def test_decontaminate_broadcasts_eval_side(spark):
    docs, ev = _dfs(spark)
    plan = (
        decontaminate(docs, ev, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_cross_split_contamination_doc_vs_cluster_routing(spark):
    """The leakage story end-to-end: identical-copy families split
    doc-level leak train 5-grams into held-out docs; routing the SAME
    corpus by dedup cluster drives cross-split contamination to exactly
    zero (family vocabularies are disjoint, so every hit is a true
    family straddle)."""
    from fuzzycat_spark.operators.decontaminate import (
        cross_split_contamination,
    )
    from fuzzycat_spark.operators.mixing import (
        assign_splits,
        assign_splits_by_cluster,
    )

    rows = [
        (fam * 3 + i,
         f"fam{fam}w0 fam{fam}w1 fam{fam}w2 fam{fam}w3 fam{fam}w4 "
         f"fam{fam}w5 fam{fam}w6 fam{fam}w7",
         fam * 3)
        for fam in range(40)
        for i in range(3)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, cluster bigint"
    )
    fractions = {"train": 0.7, "val": 0.15, "test": 0.15}

    by_doc = assign_splits(docs, fractions, seed=11)
    leaked = cross_split_contamination(by_doc, n=5).filter("contaminated")
    assert leaked.count() > 0  # doc routing straddles some family

    assignments = docs.select(
        F.col("doc_id").alias("id"), F.col("cluster").alias("cluster_id")
    )
    by_cluster = assign_splits_by_cluster(
        docs, assignments, fractions, seed=11
    )
    clean = cross_split_contamination(by_cluster, n=5)
    assert clean.filter("contaminated").count() == 0
    # held-out rows still exist — zero hits is not an empty audit
    assert clean.count() > 0


def test_cross_split_contamination_narrow_shuffle_no_text(spark):
    """The gram join is hash-vs-hash: no string gram column survives into
    the exchange (both sides reduce to md5_h64 longs) and there is no
    cartesian anywhere."""
    from fuzzycat_spark.operators.decontaminate import (
        cross_split_contamination,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d e f", "train"), (1, "a b c d e f", "val")],
        "doc_id bigint, text string, split string",
    )
    out = cross_split_contamination(docs, n=5)
    assert [r.n_train_grams_hit for r in out.collect()] == [2]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "gram#" not in plan.split("Exchange hashpartitioning(gh")[-1][:200]


def test_train_overlap_screen_flags_train_side_only(spark):
    """The actionable complement: the TRAIN copy of a straddling family
    is flagged for removal, held-out docs are never in the output, and
    clean train docs pass. Symmetry pin: a doc flagged by the audit on
    the held-out side implies its train counterpart is flagged here."""
    from fuzzycat_spark.operators.decontaminate import (
        cross_split_contamination,
        train_overlap_screen,
    )

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta", "train"),
            (1, "alpha beta gamma delta epsilon eta", "val"),   # shares 5-gram w/ 0
            (2, "one two three four five six", "train"),        # clean
            (3, "seven eight nine ten eleven twelve", "test"),  # clean
        ],
        "doc_id bigint, text string, split string",
    )
    out = {r.doc_id: (r.n_heldout_grams_hit, r.drop)
           for r in train_overlap_screen(docs, n=5).collect()}
    assert set(out) == {0, 2}  # train docs only
    assert out[0][1] is True and out[0][0] == 1
    assert out[2] == (0, False)
    audit = {r.doc_id for r in
             cross_split_contamination(docs, n=5).filter("contaminated").collect()}
    assert audit == {1}  # the held-out twin of the flagged train doc


_PLANTED = "/root/repo/fixtures/embeddings_planted.parquet"
_SEMCON_EVAL = (0, 4, 8, 12, 16, 20)


def _semcon_sides(spark):
    from pyspark.sql import functions as F

    e = spark.read.parquet(_PLANTED)
    ev = e.filter(F.col("vec_id").isin(*_SEMCON_EVAL))
    corpus = e.filter(~F.col("vec_id").isin(*_SEMCON_EVAL))
    return corpus, ev


def test_semantic_contamination_brute_flags_families_and_megas(spark):
    """Brute screen at 0.9 over the planted fixture: every family
    sibling of an eval member and every corpus copy of the eval'd mega
    vector flags; fillers stay clean with max cosine well below 0.9."""
    from fuzzycat_spark.operators.decontaminate import semantic_contamination

    corpus, ev = _semcon_sides(spark)
    rows = {r.vec_id: r for r in
            semantic_contamination(corpus, ev, threshold=0.9).collect()}
    assert len(rows) == 270 - len(_SEMCON_EVAL)
    flagged = {i for i, r in rows.items() if r.contaminated}
    family_sibs = {i for i in range(20) if i not in _SEMCON_EVAL}
    megas = set(range(21, 230))
    assert flagged == family_sibs | megas
    for i in megas:
        assert rows[i].max_eval_cos == 1.0 and rows[i].n_eval_hits == 1
    for i in range(230, 270):  # fillers
        assert rows[i].max_eval_cos < 0.6 and rows[i].n_eval_hits == 0


def test_semantic_contamination_ann_cap_excludes_mega_bucket(spark):
    """The bucketed scale path agrees with brute on the family siblings
    but EXCLUDES the 209-copy mega bucket (> max_bucket_size=200): the
    divergence is exactly those 209 rows, with NULL max_eval_cos (no
    same-bucket candidate survived the cap)."""
    from fuzzycat_spark.operators.decontaminate import (
        semantic_contamination_ann,
    )

    corpus, ev = _semcon_sides(spark)
    rows = {r.vec_id: r for r in semantic_contamination_ann(
        corpus, ev, threshold=0.9, n_planes=8, dim=64, max_bucket_size=200,
    ).collect()}
    flagged = {i for i, r in rows.items() if r.contaminated}
    assert flagged == {i for i in range(20) if i not in _SEMCON_EVAL}
    for i in range(21, 230):
        assert rows[i].max_eval_cos is None and rows[i].n_eval_hits == 0
    # raising the cap above the mega bucket restores brute behavior
    rows2 = {r.vec_id: r for r in semantic_contamination_ann(
        corpus, ev, threshold=0.9, n_planes=8, dim=64, max_bucket_size=250,
    ).collect()}
    assert all(rows2[i].contaminated for i in range(21, 230))
