"""Bigram-LM document scoring (operators/lm.py)."""

import pytest

from fuzzycat_spark.operators.lm import doc_lm_scores

S = 1_000_000_000


def _score(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = doc_lm_scores(df, scale=S, **kw).orderBy("doc_id").collect()
    return {r.doc_id: r.asDict() for r in out}


def test_hand_computed_add_one_bigram(spark):
    # corpus: "a b", "a b", "a c" -> c2(a b)=2, c2(a c)=1, ctx(a)=3, V=3
    got = _score(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    # P(b|a) = (2+1)/(3+3) = 1/2 ; P(c|a) = (1+1)/6 = 1/3
    assert got[1] == {
        "doc_id": 1, "n_bigrams": 1, "hapax_bigrams": 0,
        "sum_p_fp": S // 2, "mean_p_fp": S // 2,
    }
    assert got[2]["mean_p_fp"] == S // 2
    assert got[3] == {
        "doc_id": 3, "n_bigrams": 1, "hapax_bigrams": 1,
        "sum_p_fp": S // 3, "mean_p_fp": S // 3,
    }


def test_short_and_empty_docs_score_zero_not_dropped(spark):
    got = _score(spark, [(1, ""), (2, "  \t "), (3, "solo"), (4, "a a")])
    for i in (1, 2, 3):
        assert got[i]["n_bigrams"] == 0
        assert got[i]["sum_p_fp"] == 0
        assert got[i]["mean_p_fp"] is None
    assert got[4]["n_bigrams"] == 1


def test_template_docs_outscore_novel_prose(spark):
    # ten copies of a boilerplate line vs one unique sentence: the
    # boilerplate's bigrams dominate the model, so its mean probability
    # must be strictly higher and its hapax fraction zero.
    rows = [(i, "click here to accept cookies") for i in range(10)]
    rows.append((99, "quaint zebras ponder viaducts quietly"))
    got = _score(spark, rows)
    assert got[0]["mean_p_fp"] > got[99]["mean_p_fp"]
    assert got[0]["hapax_bigrams"] == 0
    assert got[99]["hapax_bigrams"] == got[99]["n_bigrams"] == 4


def test_mean_bounded_by_scale(spark):
    rows = [(i, f"w{i} common tail text here") for i in range(20)]
    got = _score(spark, rows)
    assert all(0 < r["mean_p_fp"] <= S for r in got.values())


def test_cross_corpus_model_unseen_bigrams(spark):
    spark_model = [(1, "a b"), (2, "a b")]
    # "a z": context a seen (ctx=2), bigram unseen -> (0+1)*S/(2+2)
    # "q z": context unseen -> denominator is V alone = 2
    model = None

    def run(rows):
        import pyspark.sql.functions as F  # noqa: F401
        m = spark.createDataFrame(spark_model, "doc_id bigint, text string")
        d = spark.createDataFrame(rows, "doc_id bigint, text string")
        out = doc_lm_scores(d, scale=S, model_docs=m).collect()
        return {r.doc_id: r.asDict() for r in out}

    got = run([(10, "a z"), (11, "q z")])
    assert got[10]["mean_p_fp"] == S // 4
    assert got[11]["mean_p_fp"] == S // 2
    assert got[10]["hapax_bigrams"] == 0  # hapax counts MODEL c==1, not 0


class TestDsirContrast:
    def _run(self, spark, docs_rows, target_rows):
        from fuzzycat_spark.operators.lm import dsir_contrast

        d = spark.createDataFrame(docs_rows, "doc_id bigint, text string")
        t = spark.createDataFrame(target_rows, "doc_id bigint, text string")
        return {
            r["doc_id"]: r.asDict()
            for r in dsir_contrast(d, t, scale=S).collect()
        }

    def test_target_like_docs_score_positive_contrast(self, spark):
        docs = [
            (1, "clean prose clean prose clean prose"),
            (2, "spam junk spam junk spam junk"),
        ]
        target = [(100, "clean prose clean prose")]
        got = self._run(spark, docs, target)
        # the target-like doc beats background under the target LM; the
        # off-target doc takes the smoothed floor and lands negative
        assert got[1]["contrast_fp"] > 0 > got[2]["contrast_fp"]
        assert got[1]["target_fp"] > got[2]["target_fp"]

    def test_floor_semantics_for_fully_unseen_doc(self, spark):
        # target model: "a b" twice -> ctx(a)=2, V=2. A doc of pairs with
        # unseen contexts scores V-alone floor S//2 per position.
        docs = [(1, "q z")]
        got = self._run(spark, docs, [(100, "a b"), (101, "a b")])
        assert got[1]["target_fp"] == S // 2
        # background model is the doc itself: (1+1)*S//(1+2)
        assert got[1]["background_fp"] == 2 * S // 3
        assert got[1]["contrast_fp"] == S // 2 - 2 * S // 3

    def test_short_docs_null_contrast_and_all_docs_present(self, spark):
        docs = [(1, "single"), (2, ""), (3, "two tokens here")]
        got = self._run(spark, docs, [(100, "two tokens here")])
        assert set(got) == {1, 2, 3}
        for i in (1, 2):
            assert got[i]["n_bigrams"] == 0
            assert got[i]["contrast_fp"] is None
        assert got[3]["contrast_fp"] is not None

    def test_explicit_background_corpus(self, spark):
        from fuzzycat_spark.operators.lm import dsir_contrast

        d = spark.createDataFrame([(1, "x y x y")], "doc_id bigint, text string")
        t = spark.createDataFrame([(2, "x y")], "doc_id bigint, text string")
        # background == target -> contrast is exactly zero
        row = dsir_contrast(d, t, scale=S, background_docs=t).collect()[0]
        assert row["contrast_fp"] == 0
