"""Per-domain cap (`operators/domains.py`): exactness of the two-stage
salted top-k against a direct single-window computation, plus tie and
under-cap behavior."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fuzzycat_spark.operators.domains import domain_cap


def test_two_stage_matches_single_window(spark):
    # 3 domains x 40 docs with a deterministic pseudo-quality; salted
    # two-stage (salt=4 so every salt group is exercised) must equal the
    # naive global window exactly
    rows = [
        (i, f"dom{i % 3}", ((i * 37) % 100) / 100.0) for i in range(120)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, src string, q double")
    got = {
        (r.domain, r.rank): r.id
        for r in domain_cap(
            docs, "src", max_per_domain=5, quality_col="q", salt=4
        ).collect()
    }
    w = Window.partitionBy("src").orderBy(F.col("q").desc(), F.col("doc_id").asc())
    want = {
        (r.src, r.rn): r.doc_id
        for r in docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .collect()
    }
    assert got == want and len(got) == 15


def test_ties_break_on_min_id_and_under_cap_domains_survive(spark):
    docs = spark.createDataFrame(
        [(9, "a", 0.5), (3, "a", 0.5), (7, "a", 0.5), (1, "b", 0.1)],
        "doc_id long, src string, q double",
    )
    out = domain_cap(docs, "src", max_per_domain=2, quality_col="q", salt=2)
    got = sorted((r.domain, r.rank, r.id) for r in out.collect())
    assert got == [("a", 1, 3), ("a", 2, 7), ("b", 1, 1)]


class TestHostQuality:
    GOOD = ("the quick brown fox jumps over the lazy dog and it then "
            "rests with the pack of hounds for a while")
    SPAM = "9482 1038 7261 5540 8823 1902 6674 3319 7248 5561"

    def _df(self, spark):
        rows = [(f"g{i}", "good.com", self.GOOD + f" {i}") for i in range(4)]
        rows += [(f"s{i}", "spam.net", self.SPAM + f" {i}") for i in range(4)]
        rows += [("lone", "tiny.org", self.GOOD)]
        return spark.createDataFrame(
            rows, "doc_id string, host string, text string"
        )

    def test_stats_and_threshold(self, spark):
        from fuzzycat_spark.operators.domains import host_quality_stats

        got = {
            r.host: r
            for r in host_quality_stats(
                self._df(spark), "host", min_mean_quality_fp=500_000
            ).collect()
        }
        assert got["good.com"].keep is True
        assert got["spam.net"].keep is False
        assert got["good.com"].mean_quality_fp > got["spam.net"].mean_quality_fp
        assert got["good.com"].n_docs == 4

    def test_min_docs_drops_sparse_hosts(self, spark):
        from fuzzycat_spark.operators.domains import host_quality_stats

        got = {
            r.host: r.keep
            for r in host_quality_stats(
                self._df(spark), "host", min_docs=2
            ).collect()
        }
        assert got["tiny.org"] is False and got["good.com"] is True

    def test_screen_removes_whole_host(self, spark):
        from fuzzycat_spark.operators.domains import host_quality_screen

        kept = host_quality_screen(
            self._df(spark), "host", min_mean_quality_fp=500_000
        )
        hosts = {r.host for r in kept.select("host").distinct().collect()}
        assert hosts == {"good.com", "tiny.org"}
        assert kept.count() == 5

    def test_mean_is_exact_integer_division(self, spark):
        from fuzzycat_spark.operators.domains import host_quality_stats

        df = spark.createDataFrame(
            [("a", "h", "the fox and the dog"), ("b", "h", "9913 8820 1039")],
            "doc_id string, host string, text string",
        )
        r = host_quality_stats(df, "host").collect()[0]
        # truncating div of the two fixed-point scores, never a float mean
        assert isinstance(r.mean_quality_fp, int)
