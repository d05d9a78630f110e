"""Between-crawl delta classification (operators/delta.py)."""

from pyspark.sql import functions as F

from fuzzycat_spark.operators.delta import crawl_delta


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_all_four_statuses(spark):
    old = _pages(spark, [("a", "one"), ("b", "two"), ("c", "three")])
    new = _pages(spark, [("a", "one"), ("b", "TWO!"), ("d", "four")])
    got = {r.key: r.status for r in crawl_delta(old, new).collect()}
    assert got == {
        "a": "unchanged", "b": "changed", "c": "removed", "d": "added",
    }


def test_null_text_hashes_like_empty(spark):
    old = _pages(spark, [("a", "payload"), ("b", None)])
    new = _pages(spark, [("a", None), ("b", "")])
    got = {r.key: r.status for r in crawl_delta(old, new).collect()}
    # a lost its payload -> changed, not removed; b: NULL == '' -> unchanged
    assert got == {"a": "changed", "b": "unchanged"}


def test_hash_columns_round_trip(spark):
    old = _pages(spark, [("a", "x")])
    new = _pages(spark, [("a", "x")])
    r = crawl_delta(old, new).collect()[0]
    assert r.old_hash == r.new_hash and len(r.old_hash) == 32


def test_composition_with_surt_and_latest_revision(spark):
    """The documented upstream: SURT-canonicalize + collapse revisits,
    then diff — URL spelling changes between crawls do NOT read as
    remove+add, and only the newest snapshot's content is compared."""
    from fuzzycat_spark.functions.urls import latest_revision

    old_raw = spark.createDataFrame(
        [
            (1, "https://example.com/news/story", "2026-01-01 00:00:00", "v1"),
            (2, "https://example.com/news/story?utm_source=f",
             "2026-02-01 00:00:00", "v2"),
            (3, "https://gone.example.org/x", "2026-01-05 00:00:00", "bye"),
        ],
        "doc_id bigint, url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))
    new_raw = spark.createDataFrame(
        [
            (9, "http://www.example.com/news/story/",
             "2026-06-01 00:00:00", "v2"),
            (10, "https://fresh.example.net/y", "2026-06-02 00:00:00", "hi"),
        ],
        "doc_id bigint, url string, warc_ts string, text string",
    ).withColumn("warc_ts", F.to_timestamp("warc_ts"))

    def collapse(raw):
        win = latest_revision(raw)
        return win.join(
            raw.select(F.col("doc_id").alias("id"), "text"), "id"
        ).select(F.col("surt").alias("url"), "text")

    got = {
        r.key: r.status
        for r in crawl_delta(collapse(old_raw), collapse(new_raw)).collect()
    }
    assert len(got) == 3
    by_status = sorted(got.values())
    # story: old newest snapshot is v2 (Feb), new spelling collapses to
    # the same SURT with identical text -> unchanged
    assert by_status == ["added", "removed", "unchanged"]
    assert got[[k for k in got if "news" in k][0]] == "unchanged"


def test_duplicate_keys_collapse_instead_of_multiplying(spark):
    # two revisit rows per key on the old side; identical version sets
    # read unchanged, a genuinely-new version reads changed, and the
    # output stays one row per key either way
    old = _pages(
        spark,
        [("a", "v1"), ("a", "v2"), ("b", "x"), ("b", "x"), ("c", "z")],
    )
    new = _pages(spark, [("a", "v1"), ("a", "v2"), ("b", "x"), ("c", "Z!")])
    rows = crawl_delta(old, new).collect()
    assert len(rows) == 3  # one row per key, never |old_k| x |new_k|
    got = {r.key: r.status for r in rows}
    assert got == {"a": "unchanged", "b": "unchanged", "c": "changed"}


def test_content_moves_detects_url_move(spark):
    from fuzzycat_spark.operators.delta import content_moves

    old = _pages(spark, [("a", "stable"), ("m", "payload")])
    new = _pages(spark, [("a", "stable"), ("z", "payload")])
    rows = content_moves(crawl_delta(old, new)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.old_key, r.new_key, r.n_old_gone, r.n_new_added) == ("m", "z", 1, 1)


def test_content_moves_min_key_and_counts(spark):
    from fuzzycat_spark.operators.delta import content_moves

    # two old copies vanish, three new copies appear; representatives
    # are the smallest key on each side
    old = _pages(spark, [("m2", "dup"), ("m1", "dup")])
    new = _pages(spark, [("n3", "dup"), ("n1", "dup"), ("n2", "dup")])
    r = content_moves(crawl_delta(old, new)).collect()[0]
    assert (r.old_key, r.new_key, r.n_old_gone, r.n_new_added) == ("m1", "n1", 2, 3)


def test_content_moves_ignores_changed_and_pure_adds(spark):
    from fuzzycat_spark.operators.delta import content_moves

    old = _pages(spark, [("a", "v1"), ("b", "gone-forever")])
    new = _pages(spark, [("a", "v2"), ("c", "brand-new")])
    # b removed, c added, but hashes differ -> no move rows
    assert content_moves(crawl_delta(old, new)).count() == 0
