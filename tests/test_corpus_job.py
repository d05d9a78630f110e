"""jobs/corpus_job.py — the composed crawl→training-shards pipeline.

Runs main() in-process (same code spark-submit executes; the submit
mechanics themselves are pinned by tests/test_spark_submit.py) over the
synthetic corpus with every optional stage enabled, then proves resume:
a second run with the same checkpoint loads every stage instead of
recomputing.
"""

from __future__ import annotations

import json
import sys

import pytest
from pyspark.sql import functions as F

from fuzzycat_spark.sources import synth_pages


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus_in")
    synth_pages(spark, 80, 40).write.mode("overwrite").parquet(str(d / "pages"))
    return str(d / "pages")


@pytest.fixture(scope="module")
def eval_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("evalfx")
    # plant an eval prompt sharing an 8-gram with the synth template text
    some = synth_pages(spark, 3, 0).select("text").limit(1).collect()[0]["text"]
    leak = " ".join(some.split()[:12])
    spark.createDataFrame(
        [("e0", leak), ("e1", "completely unrelated benchmark prompt nothing")],
        "eval_id string, text string",
    ).write.mode("overwrite").parquet(str(d / "eval"))
    return str(d / "eval")


def _run(argv: list[str], capsys) -> dict:
    from jobs import corpus_job

    old = sys.argv
    sys.argv = ["corpus_job.py"] + argv
    try:
        corpus_job.main()
    finally:
        sys.argv = old
    out = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith('{"stages"')
    ]
    return json.loads(out[-1])


def test_end_to_end_all_stages_and_resume(
    spark, corpus_dir, eval_dir, tmp_path, capsys, monkeypatch
):
    # main() calls spark.stop(); keep the shared session alive
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    out_dir, ckpt = str(tmp_path / "shards"), str(tmp_path / "ckpt")
    argv = [
        "--input", corpus_dir,
        "--output", out_dir,
        "--checkpoint", ckpt,
        "--strategies", "exact,slug,minhash",
        "--pii",
        "--eval-path", eval_dir,
        "--max-per-domain", "50",
        "--mix-budgets", json.dumps({"en": 1e9, "de": 1e9, "fr": 1e9,
                                     "es": 1e9, "zh": 1e9}),
        "--n-shards", "4",
    ]
    rec = _run(argv, capsys)
    stages = rec["stages"]
    for name in ("filtered", "corpus", "decontaminated", "capped", "mixed"):
        assert name in stages, stages
    assert rec["docs_out"] > 0

    shards = spark.read.parquet(out_dir)
    n_in = spark.read.parquet(corpus_dir).count()
    # dedup + filters must have removed something on a 33% dup-rate corpus
    assert 0 < rec["docs_out"] < n_in
    assert shards.select("shard").distinct().count() == 4
    # canonical metadata survives to the shard files
    assert {"url", "cluster_id", "n_members"} <= set(shards.columns)
    # kept docs are unique cluster representatives
    assert shards.select("cluster_id").distinct().count() == rec["docs_out"]

    # contaminated docs are gone: re-judging the kept corpus against the
    # same eval suite finds zero leaks
    from fuzzycat_spark.operators.decontaminate import decontaminate

    verdict = decontaminate(
        shards, spark.read.parquet(eval_dir), id_col="url", text_col="text"
    )
    assert verdict.filter(F.col("contaminated")).count() == 0
    # and the leak was real: the raw input DOES contain contaminated docs
    raw_verdict = decontaminate(
        spark.read.parquet(corpus_dir), spark.read.parquet(eval_dir),
        id_col="url", text_col="text",
    )
    assert raw_verdict.filter(F.col("contaminated")).count() > 0

    # resume: second run loads all stages (manifest unchanged, fast path)
    rec2 = _run(argv, capsys)
    assert rec2["docs_out"] == rec["docs_out"]
    assert set(rec2["stages"]) == set(stages)


def test_warc_input_arm(spark, tmp_path, capsys, monkeypatch):
    """--input-format warc: raw crawl archive → extracted text → shards.
    The committed fixture's 200-HTML pages flow through the same stages."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", "/root/repo/fixtures/sample.warc.gz",
         "--output", out_dir, "--checkpoint", ckpt,
         "--input-format", "warc", "--strategies", "exact,slug",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert rec["docs_out"] > 0
    kept = spark.read.parquet(out_dir)
    assert {"url", "text", "cluster_id", "shard"} <= set(kept.columns)
    # extraction happened: kept text is html-free
    assert kept.filter(F.col("text").contains("<")).count() == 0


def test_strip_common_lines_arm(spark, tmp_path, capsys, monkeypatch):
    """--strip-common-lines removes the cross-document cookie banner
    while each doc's unique body lines survive to the shards."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    banner = "This website uses cookies to improve your experience"
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [
            (f"u{i}", f"{banner}\nunique prose number {i} about topic "
                      f"{i * 7} with several plain words\nfooter {i}")
            for i in range(20)
        ],
        "url string, text string",
    ).write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--strip-common-lines",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert rec["docs_out"] == 20
    kept = spark.read.parquet(out_dir)
    assert kept.filter(F.col("text").contains("cookies")).count() == 0
    assert kept.filter(F.col("text").contains("unique prose")).count() == 20


def test_pii_redaction_applies(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [
            (f"u{i}", f"contact me at agent{i}@mail.example.org about the "
                      f"quarterly report volume twelve section {i} thanks")
            for i in range(30)
        ],
        "url string, text string",
    ).write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--pii", "--no-repetition-filter",
         "--min-quality", "0", "--min-tokens", "1", "--n-shards", "2"],
        capsys,
    )
    assert rec["docs_out"] == 30
    kept = spark.read.parquet(out_dir)
    assert kept.filter(F.col("text").contains("@")).count() == 0
    assert kept.filter(F.col("text").contains("<EMAIL>")).count() == 30


def test_dup_span_and_packing_arms(spark, tmp_path, capsys, monkeypatch):
    """--strip-dup-spans removes a license passage stamped across docs
    (after canonical selection, so distinct docs keep distinct prose);
    --pack-seq-len annotates every shard row with its packing layout."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    license_ = "released under the creative commons attribution license"
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [
            (f"u{i}", f"distinct article body number {i} covering subject "
                      f"{i * 13} in plain prose {license_}")
            for i in range(20)
        ],
        "url string, text string",
    ).write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--strip-dup-spans", "5",
         "--pack-seq-len", "16", "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "span_stripped" in rec["stages"] and "packed" in rec["stages"]
    assert rec["docs_out"] == 20
    kept = spark.read.parquet(out_dir)
    assert kept.filter(F.col("text").contains("creative commons")).count() == 0
    assert kept.filter(F.col("text").contains("distinct article")).count() == 20
    assert kept.filter(F.col("dupspan_removed") <= 0).count() == 0
    # packing layout: per shard, offsets are the cumulative token stream
    rows = sorted(
        kept.select("shard", "start_off", "n_tokens", "start_seq",
                    "end_seq").collect(),
        key=lambda r: (r["shard"], r["start_off"]),
    )
    off = {}
    for r in rows:
        assert r["start_off"] == off.get(r["shard"], 0)
        assert r["start_seq"] == r["start_off"] // 16
        assert r["end_seq"] == (r["start_off"] + r["n_tokens"] - 1) // 16
        off[r["shard"]] = r["start_off"] + r["n_tokens"]


def test_host_centrality_arm_drops_unlinked_hosts(
    spark, tmp_path, capsys, monkeypatch
):
    """--min-host-centrality: PageRank over the crawl's own link graph
    screens hosts nobody links to; kept pages carry host_centrality."""
    from fuzzycat_spark.operators.linkgraph import teleport_base

    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    def pg(host, i, dst):
        url = f"https://{host}/p{i}"
        html = (f'<html><body><a href="{dst}">out</a>'
                f"<p>article {host} {i} body prose</p></body></html>")
        return (url, html, f"article body from {host} number {i} in prose")

    rows = (
        [pg("hub.example", i, "https://good.example/") for i in range(5)]
        + [pg("good.example", i, "https://hub.example/") for i in range(10)]
        + [pg("spam.example", i, "https://good.example/") for i in range(5)]
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "url string, html string, text string"
    ).write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact",
         "--min-host-centrality", str(teleport_base() + 1),
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "host_scores" in rec["stages"] and "host_filtered" in rec["stages"]
    kept = spark.read.parquet(out_dir)
    urls = [r.url for r in kept.select("url").collect()]
    # spam.example has no inlinks -> teleport base -> screened out
    assert not any("spam.example" in u for u in urls)
    assert sum("good.example" in u for u in urls) == 10
    assert sum("hub.example" in u for u in urls) == 5
    assert kept.filter(F.col("host_centrality") <= teleport_base()).count() == 0


def test_lm_score_arm_drops_disfluent_docs(spark, tmp_path, capsys, monkeypatch):
    """--min-lm-score: pages scoring below the corpus-LM fluency floor
    leave before dedup; kept pages carry lm_mean_p."""
    from fuzzycat_spark.operators.lm import doc_lm_scores

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    prose = [
        (f"https://a.example/p{i}",
         f"the quick brown fox jumps over the lazy dog again item {i}")
        for i in range(30)
    ]
    junk = [
        ("https://b.example/j1", "zxqv wkfjd plmtr aaghw"),
        ("https://b.example/j2", "qqleu vbnms trewq zzokj"),
    ]
    df = spark.createDataFrame(prose + junk, "url string, text string")
    scores = {
        r.url: r.mean_p_fp
        for r in doc_lm_scores(df, id_col="url", text_col="text").collect()
    }
    lo = max(scores[u] for u, _ in junk)
    hi = min(scores[u] for u, _ in prose)
    assert lo < hi, (lo, hi)
    threshold = (lo + hi) // 2

    src = str(tmp_path / "in")
    df.write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--min-lm-score", str(threshold),
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "lm_filtered" in rec["stages"]
    kept = spark.read.parquet(out_dir)
    urls = [r.url for r in kept.select("url").collect()]
    assert not any("b.example" in u for u in urls)
    assert len(urls) == 30
    assert kept.filter(F.col("lm_mean_p") < threshold).count() == 0


def test_vocab_arm_emits_side_table(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(f"u{i}", f"common common rare{i} filler words here") for i in range(10)],
        "url string, text string",
    ).write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--vocab-top-k", "3",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "vocab" in rec["stages"]
    vocab = spark.read.parquet(f"{ckpt}/vocab")
    rows = {r["gram"]: r["occurrences"] for r in vocab.collect()}
    assert len(rows) == 3 and rows["common"] == 20


def test_bpe_merges_arm_emits_model_table(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(f"u{i}", "low low low lower newest newest widest") for i in range(6)],
        "url string, text string",
    ).write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--bpe-merges", "3",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "bpe_merges" in rec["stages"]
    merges = spark.read.parquet(f"{ckpt}/bpe_merges")
    rows = sorted(
        (r.step, r.left, r.right, r.merged) for r in merges.collect()
    )
    assert [r[0] for r in rows] == [1, 2, 3]
    # the persisted model encodes future corpora through bpe_apply
    from fuzzycat_spark.operators.bpe import bpe_apply

    model = [(r[1], r[2]) for r in rows]
    unseen = spark.createDataFrame(
        [("x", "lowest")], "id string, text string"
    )
    n = bpe_apply(unseen, model).collect()[0].n_tokens_bpe
    assert 0 < n < len("lowest")


def test_lm_bucket_arm_keeps_requested_tiers(spark, tmp_path, capsys, monkeypatch):
    """--lm-bucket-keep head,middle: the tail tertile of corpus-LM scores
    leaves before dedup; kept pages carry lm_mean_p + lm_bucket."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    prose = [
        (f"https://a.example/p{i}",
         f"the quick brown fox jumps over the lazy dog again item {i}")
        for i in range(30)
    ]
    junk = [
        (f"https://b.example/j{i}",
         " ".join(f"zx{i}q{j}" for j in range(8)))
        for i in range(6)
    ]
    df = spark.createDataFrame(prose + junk, "url string, text string")
    src = str(tmp_path / "in")
    df.write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--lm-bucket-keep", "head,middle",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "lm_bucketed" in rec["stages"]
    kept = spark.read.parquet(out_dir)
    rows = kept.select("url", "lm_mean_p", "lm_bucket").collect()
    assert set(r.lm_bucket for r in rows) <= {"head", "middle"}
    # ~1/3 of the admitted corpus leaves; all-hapax junk is never 'head'
    assert 0 < len(rows) < 36
    junk_kept = [r for r in rows if "b.example" in r.url]
    assert all(r.lm_bucket != "head" for r in junk_kept)


def test_lm_bucket_keep_rejects_unknown_tier(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    df = spark.createDataFrame(
        [("https://a.example/p", "a b c")], "url string, text string"
    )
    src = str(tmp_path / "in")
    df.write.mode("overwrite").parquet(src)
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        _run(
            ["--input", src, "--output", str(tmp_path / "o"),
             "--checkpoint", str(tmp_path / "c"),
             "--lm-bucket-keep", "head,bogus"],
            capsys,
        )


def test_previous_crawl_delta_screen(spark, tmp_path, capsys, monkeypatch):
    """--previous-crawl: pages unchanged since the prior crawl leave
    before dedup; new and changed pages flow through."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    base = "the quick brown fox jumps over the lazy dog again item"
    prev_rows = [
        (f"https://a.example/p{i}", f"{base} {i}") for i in range(20)
    ]
    cur_rows = (
        [(f"https://a.example/p{i}", f"{base} {i}") for i in range(15)]
        # p15..p19 changed content
        + [(f"https://a.example/p{i}", f"{base} {i} updated edition")
           for i in range(15, 20)]
        # brand new pages
        + [(f"https://a.example/new{i}", f"{base} brand new {i}")
           for i in range(3)]
    )
    prev_src, cur_src = str(tmp_path / "prev"), str(tmp_path / "cur")
    spark.createDataFrame(prev_rows, "url string, text string").write.parquet(prev_src)
    spark.createDataFrame(cur_rows, "url string, text string").write.parquet(cur_src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", cur_src, "--output", out_dir, "--checkpoint", ckpt,
         "--previous-crawl", prev_src, "--strategies", "exact",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "delta_screened" in rec["stages"]
    urls = {r.url for r in spark.read.parquet(out_dir).select("url").collect()}
    assert urls == (
        {f"https://a.example/p{i}" for i in range(15, 20)}
        | {f"https://a.example/new{i}" for i in range(3)}
    )


def test_lm_bucket_sample_zero_rejected(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    df = spark.createDataFrame(
        [("https://a.example/p", "a b c d e f")], "url string, text string"
    )
    src = str(tmp_path / "in")
    df.write.parquet(src)
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="lm-bucket-sample"):
        _run(
            ["--input", src, "--output", str(tmp_path / "o"),
             "--checkpoint", str(tmp_path / "c"),
             "--lm-bucket-keep", "head", "--lm-bucket-sample", "0",
             "--min-quality", "0", "--min-tokens", "1",
             "--no-repetition-filter"],
            capsys,
        )


def test_emit_postings_side_table_queries(spark, tmp_path, capsys, monkeypatch):
    """--emit-postings: the checkpointed posting table answers retrieval
    queries via terms= with the same results as inline scoring."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rows = [
        (f"https://a.example/p{i}",
         f"the quick brown fox jumps over dog {i} " + ("spark " * (i % 3)))
        for i in range(12)
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, "url string, text string").write.parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--emit-postings",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "postings" in rec["stages"]
    from fuzzycat_spark.operators.retrieval import lexical_topk

    terms = spark.read.parquet(f"{ckpt}/postings")
    assert set(terms.columns) == {"id", "h", "tf", "dl"}
    kept = spark.read.parquet(out_dir).select(
        F.col("url").alias("doc_id"), F.col("text")
    )
    qs = spark.createDataFrame([(1, "spark fox")], "query_id int, qtext string")
    via_table = {
        (r.query_id, r.doc_id): (r.score_fp, r.rank)
        for r in lexical_topk(kept, qs, k=5, terms=terms).collect()
    }
    inline = {
        (r.query_id, r.doc_id): (r.score_fp, r.rank)
        for r in lexical_topk(kept, qs, k=5).collect()
    }
    assert via_table == inline and len(inline) == 5


def test_emit_sketches_side_table(spark, tmp_path, capsys, monkeypatch):
    """--emit-sketches: the checkpointed sketch table carries the LogLog
    registers and count-min cells of the KEPT corpus's token stream, and
    the registers match a direct recomputation over the output."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rows = [
        (f"https://a.example/p{i}",
         f"unique{i} words flow here and also common filler text {i}")
        for i in range(10)
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, "url string, text string").write.parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--emit-sketches",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "sketches" in rec["stages"]
    from fuzzycat_spark.operators.sketch import loglog_registers
    from fuzzycat_spark.operators.spans import raw_tokens

    sk = spark.read.parquet(f"{ckpt}/sketches")
    assert set(sk.columns) == {"sketch", "grp", "r", "v"}
    kinds = {r.sketch for r in sk.select("sketch").distinct().collect()}
    assert kinds == {"loglog", "cms"}
    kept = spark.read.parquet(out_dir)
    toks = kept.select(F.lit("all").alias("grp"),
                       F.explode(raw_tokens("text")).alias("tok"))
    direct = {
        (r.bucket, r.rho_max)
        for r in loglog_registers(toks, ["grp"], "tok").collect()
    }
    via_job = {
        (r.r, r.v)
        for r in sk.filter(F.col("sketch") == "loglog").collect()
    }
    assert via_job == direct


def test_cross_corpus_screen_round_trip(spark, tmp_path, capsys, monkeypatch):
    """--reference-corpus / --emit-bands over two consecutive crawls:
    run 1 writes shards + its band table; run 2 screens against run 1's
    OUTPUT using run 1's persisted bands — near-dups of the frozen corpus
    leave, genuinely new pages survive."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliett kilo lima mike november oscar papa quebec romeo")
    crawl1 = [
        (f"https://a.example/p{i}", f"{base} edition {i}") for i in range(6)
    ] + [("https://a.example/solo", "seven silent ships sailing south "
          "under storm clouds tonight bring rain")]
    crawl2 = (
        # carried-over near-dups of crawl-1 pages (new urls, ~same text)
        [(f"https://b.example/copy{i}", f"{base} edition {i}")
         for i in range(4)]
        # genuinely new content
        + [(f"https://b.example/new{i}",
            f"totally fresh subject {i} covering gardens rivers "
            f"mountains valleys forests deserts islands beaches")
           for i in range(3)]
    )
    src1, src2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    spark.createDataFrame(crawl1, "url string, text string").write.parquet(src1)
    spark.createDataFrame(crawl2, "url string, text string").write.parquet(src2)
    out1, ck1 = str(tmp_path / "out1"), str(tmp_path / "ck1")
    common = ["--strategies", "exact", "--min-quality", "0",
              "--min-tokens", "1", "--no-repetition-filter",
              "--n-shards", "2"]
    rec1 = _run(
        ["--input", src1, "--output", out1, "--checkpoint", ck1,
         "--emit-bands"] + common,
        capsys,
    )
    assert "bands" in rec1["stages"]
    bands = spark.read.parquet(f"{ck1}/bands")
    assert set(bands.columns) == {"id", "band_id", "band_hash"}

    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    rec2 = _run(
        ["--input", src2, "--output", out2, "--checkpoint", ck2,
         "--reference-corpus", out1, "--reference-bands", f"{ck1}/bands",
         "--cross-jaccard", "0.8"] + common,
        capsys,
    )
    assert "cross_screened" in rec2["stages"]
    urls = {r.url for r in spark.read.parquet(out2).select("url").collect()}
    assert urls == {f"https://b.example/new{i}" for i in range(3)}

    # without the persisted bands (reference hashed in-job): same keep set
    out3, ck3 = str(tmp_path / "out3"), str(tmp_path / "ck3")
    _run(
        ["--input", src2, "--output", out3, "--checkpoint", ck3,
         "--reference-corpus", out1, "--cross-jaccard", "0.8"] + common,
        capsys,
    )
    urls3 = {r.url for r in spark.read.parquet(out3).select("url").collect()}
    assert urls3 == urls


def test_quality_weights_arm_drops_spam(spark, tmp_path, capsys, monkeypatch):
    """--quality-weights / --min-classifier-score: pages scoring below the
    pinned-vocabulary linear classifier's threshold leave before dedup;
    kept pages carry cls_score."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rows = [
        (f"https://a.example/good{i}",
         f"the river valley was surveyed by local historians over several "
         f"decades with careful attention to seasonal records {i}")
        for i in range(4)
    ] + [
        (f"https://a.example/spam{i}",
         "casino bonus click here buy now cheap pills jackpot winner "
         f"free shipping casino bonus {i}")
        for i in range(3)
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, "url string, text string").write.parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--quality-weights",
         "/root/repo/fixtures/classifier_weights.parquet",
         "--strategies", "exact", "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "classifier_filtered" in rec["stages"]
    kept = spark.read.parquet(out_dir)
    urls = {r.url for r in kept.select("url").collect()}
    assert urls == {f"https://a.example/good{i}" for i in range(4)}
    assert "cls_score" in kept.columns
    assert all(r.cls_score > 0 for r in kept.select("cls_score").collect())


def test_seen_bloom_round_trip(spark, tmp_path, capsys, monkeypatch):
    """--emit-bloom / --seen-bloom over two crawls: run 1 persists the
    O(1)-sized membership filter of its kept ids; run 2 drops exactly the
    re-crawled urls and keeps the genuinely new ones (no false negatives;
    m=2^20 over 7 ids makes false positives astronomically unlikely)."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    crawl1 = [
        (f"https://a.example/p{i}",
         f"stable page {i} discussing harbors lighthouses tides ferries "
         f"docks gulls ropes anchors")
        for i in range(7)
    ]
    crawl2 = (
        # re-crawled urls (same ids — the bloom drops them regardless of text)
        [(f"https://a.example/p{i}", f"stable page {i} lightly edited "
          f"discussing harbors lighthouses tides ferries docks gulls")
         for i in range(4)]
        + [(f"https://b.example/new{i}",
            f"brand new article {i} about orchards beehives meadows "
            f"creeks barns fences tractors silos")
           for i in range(3)]
    )
    src1, src2 = str(tmp_path / "in1"), str(tmp_path / "in2")
    spark.createDataFrame(crawl1, "url string, text string").write.parquet(src1)
    spark.createDataFrame(crawl2, "url string, text string").write.parquet(src2)
    common = ["--strategies", "exact", "--min-quality", "0",
              "--min-tokens", "1", "--no-repetition-filter",
              "--n-shards", "2", "--bloom-m-bits", str(1 << 20)]
    out1, ck1 = str(tmp_path / "out1"), str(tmp_path / "ck1")
    rec1 = _run(
        ["--input", src1, "--output", out1, "--checkpoint", ck1,
         "--emit-bloom"] + common,
        capsys,
    )
    assert "bloom" in rec1["stages"]
    bloom = spark.read.parquet(f"{ck1}/bloom")
    assert set(bloom.columns) == {"word", "bits"}

    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    rec2 = _run(
        ["--input", src2, "--output", out2, "--checkpoint", ck2,
         "--seen-bloom", f"{ck1}/bloom"] + common,
        capsys,
    )
    assert "bloom_screened" in rec2["stages"]
    urls = {r.url for r in spark.read.parquet(out2).select("url").collect()}
    assert urls == {f"https://b.example/new{i}" for i in range(3)}


def test_flatten_budget_arm(spark, tmp_path, capsys, monkeypatch):
    """--flatten-budget: sqrt-temperature language rebalancing — the
    tail language clamps to rate 1 (all kept), the head language
    subsamples toward its sqrt share."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rows = [
        (f"https://a.example/en{i}", "en",
         f"english article number {i} about rivers bridges canals "
         f"ferries locks and harbors in detail")
        for i in range(90)
    ] + [
        (f"https://a.example/de{i}", "de",
         f"deutscher artikel nummer {i} über flüsse brücken kanäle "
         f"fähren schleusen und häfen im detail")
        for i in range(10)
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "url string, lang string, text string"
    ).write.parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--flatten-budget", "50",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "flattened" in rec["stages"]
    kept = spark.read.parquet(out_dir)
    by = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    # sqrt weights ~9.49:3.16 -> de expects 50*.25=12.5 of 10 -> clamp 1
    assert by["de"] == 10
    # en expects 50*.75=37.5 of 90 -> Bernoulli around rate .4167
    assert 20 < by["en"] < 60
    assert "rate" in kept.columns


def test_splits_arm_routes_by_cluster(spark, tmp_path, capsys, monkeypatch):
    """--splits: the stamped split is a pure md5 function of the CLUSTER
    label (not the doc id), replicated here in hashlib — so near-dup
    families can never straddle a boundary and a rerun that picks a
    different canonical representative keeps the family's split."""
    import hashlib

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rows = [
        (f"https://a.example/p{i}",
         f"distinct article number {i} about rivers bridges canals "
         f"ferries locks and harbors described at satisfying length")
        for i in range(40)
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, "url string, text string").write.parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--splits",
         '{"train": 0.75, "val": 0.25}', "--split-seed", "5",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    assert "split_stamped" in rec["stages"]
    kept = spark.read.parquet(out_dir).select("cluster_id", "split").collect()
    assert kept and all(r.split in ("train", "val") for r in kept)
    bound = int(0.75 * (1 << 48))
    for r in kept:
        f = int(hashlib.md5(f"{r.cluster_id}:5".encode()).hexdigest()[:12], 16)
        assert r.split == ("train" if f < bound else "val")
    assert {r.split for r in kept} == {"train", "val"}


def test_flatten_and_mix_mutually_exclusive(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    df = spark.createDataFrame(
        [("https://a.example/p", "en", "a b c")],
        "url string, lang string, text string",
    )
    src = str(tmp_path / "in")
    df.write.parquet(src)
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        _run(
            ["--input", src, "--output", str(tmp_path / "o"),
             "--checkpoint", str(tmp_path / "c"),
             "--flatten-budget", "5", "--mix-budgets", "{\"en\": 10}"],
            capsys,
        )


def test_honor_noindex_arm_drops_opted_out_pages(spark, tmp_path, capsys, monkeypatch):
    """--honor-noindex: pages whose robots meta declares noindex (or
    none) never reach any downstream stage; indexable pages flow
    through. Requires an html column and fails loudly without one."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    body = ("informative article about rivers bridges canals ferries "
            "locks and harbors in considerable detail")
    rows = [
        (f"https://a.example/keep{i}", f"{body} variant {i}",
         f"<html><head></head><body><p>{body} variant {i}</p></body></html>".encode())
        for i in range(6)
    ] + [
        (f"https://a.example/drop{i}", f"{body} hidden {i}",
         (f"<html><head><meta name=robots content='noindex'></head>"
          f"<body><p>{body} hidden {i}</p></body></html>").encode())
        for i in range(3)
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "url string, text string, html binary"
    ).write.parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--honor-noindex",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    kept = {r.url for r in spark.read.parquet(out_dir).select("url").collect()}
    assert kept == {f"https://a.example/keep{i}" for i in range(6)}

    # without an html column the flag must fail loudly, not silently pass
    src2 = str(tmp_path / "in2")
    spark.createDataFrame(
        [("https://a.example/x", body)], "url string, text string"
    ).write.parquet(src2)
    import pytest as _pytest

    with _pytest.raises(SystemExit, match="html column"):
        _run(
            ["--input", src2, "--output", str(tmp_path / "o2"),
             "--checkpoint", str(tmp_path / "c2"), "--honor-noindex"],
            capsys,
        )


def test_use_canonical_arm_clusters_amp_variant(spark, tmp_path, capsys, monkeypatch):
    """--use-canonical: the AMP stub's rel=canonical declaration folds it
    into the article's cluster (n_members 2, one representative kept)
    even though its text shares nothing with the article."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    art = ("the full article text about rivers bridges canals ferries "
           "locks and harbors described at satisfying length")
    rows = [
        ("https://example.com/articles/42", art,
         f"<html><head></head><body><p>{art}</p></body></html>".encode()),
        ("https://amp.example.com/a42/amp",
         "amp teaser entirely different words truncated here briefly now",
         (b"<html><head><link rel=canonical "
          b"href='https://example.com/articles/42'></head>"
          b"<body><p>amp teaser entirely different words truncated here "
          b"briefly now</p></body></html>")),
        ("https://example.com/other",
         "an unrelated page about astronomy telescopes comets and stars",
         b"<html><body><p>an unrelated page about astronomy telescopes "
         b"comets and stars</p></body></html>"),
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(
        rows, "url string, text string, html binary"
    ).write.parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact,slug", "--use-canonical",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "1"],
        capsys,
    )
    assert rec["docs_out"] == 2  # article + unrelated; AMP stub folded in
    kept = {
        r.url: r.n_members
        for r in spark.read.parquet(out_dir).select("url", "n_members").collect()
    }
    assert kept["https://example.com/articles/42"] == 2
    assert kept["https://example.com/other"] == 1
    assert "https://amp.example.com/a42/amp" not in kept


def test_screen_train_overlap_arm(spark, tmp_path, capsys, monkeypatch):
    """--screen-train-overlap: train docs sharing an N-gram with held-out
    docs are dropped from the shipped shards; held-out docs and clean
    train docs survive. Requires --splits (validated)."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    leak = "the identical leaking passage about rivers bridges canals"
    rows = [
        (f"https://a.example/p{i}",
         f"distinct article number {i} " + (
             leak if i in (0, 1) else
             f"about unrelated topic {i} telescopes comets stars moons"))
        for i in range(30)
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, "url string, text string").write.parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--splits", '{"train": 0.7, "val": 0.3}',
         "--split-seed", "2", "--screen-train-overlap", "5",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "1"],
        capsys,
    )
    assert "train_screened" in rec["stages"]
    kept = spark.read.parquet(out_dir).select("url", "split", "text").collect()
    by_split = {}
    for r in kept:
        by_split.setdefault(r.split, []).append(r.text)
    # any kept train doc shares no 5-gram with any kept held-out doc —
    # and if the leak pair straddled, the TRAIN copy is the one gone
    leak_train = [t for t in by_split.get("train", []) if leak in t]
    leak_val = [t for t in by_split.get("val", []) if leak in t]
    assert not (leak_train and leak_val)
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        _run(
            ["--input", src, "--output", str(tmp_path / "o2"),
             "--checkpoint", str(tmp_path / "c2"),
             "--screen-train-overlap", "5"],
            capsys,
        )
    # a --splits JSON without a split literally named "train" would make
    # the screen a silent no-op (empty train side) — rejected up front
    with _pytest.raises(SystemExit):
        _run(
            ["--input", src, "--output", str(tmp_path / "o3"),
             "--checkpoint", str(tmp_path / "c3"),
             "--splits", '{"trn": 0.7, "val": 0.3}',
             "--screen-train-overlap", "5"],
            capsys,
        )


def test_train_screen_runs_before_side_artifacts(
    spark, tmp_path, capsys, monkeypatch
):
    """--screen-train-overlap REMOVES rows, so it must execute before the
    side artifacts documented as covering the FINAL kept corpus — else a
    screened-out train doc's id lands in the --emit-bloom filter (and its
    bands in --emit-bands) and the next crawl screens fresh pages as dups
    of a doc that was never shipped. Pinned via the stage manifest order
    AND by checking the bloom filter rejects the screened-out doc."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    leak = "the identical leaking passage about rivers bridges canals"
    rows = [
        (f"https://a.example/p{i}",
         f"distinct article number {i} " + (
             leak if i in (0, 1) else
             f"about unrelated topic {i} telescopes comets stars moons"))
        for i in range(30)
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, "url string, text string").write.parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--splits", '{"train": 0.7, "val": 0.3}',
         "--split-seed", "2", "--screen-train-overlap", "5",
         "--emit-bloom", "--emit-bands", "--bloom-m-bits", str(1 << 20),
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "1"],
        capsys,
    )
    stages = rec["stages"]
    assert stages.index("train_screened") < stages.index("bloom")
    assert stages.index("train_screened") < stages.index("bands")
    kept = {r.url for r in spark.read.parquet(out_dir).select("url").collect()}
    screened = {f"https://a.example/p{i}" for i in range(30)} - kept
    assert screened  # the leak's train copy was dropped
    from fuzzycat_spark.operators.sketch import bloom_contains

    bloom = spark.read.parquet(f"{ckpt}/bloom")
    verdict = bloom_contains(
        bloom,
        spark.createDataFrame(
            [(f"https://a.example/p{i}",) for i in range(30)], "url string"
        ),
        "url", m_bits=1 << 20,
    )
    member = {r.url: r.may_contain for r in verdict.collect()}
    # every shipped doc is in the filter (no false negatives); the
    # screened-out docs are NOT — they were never shipped, so a later
    # --seen-bloom crawl must not treat fresh copies as already seen
    assert all(member[u] for u in kept)
    assert not any(member[u] for u in screened)


def test_semantic_screen_arm_drops_eval_near_dup(
    spark, tmp_path, capsys, monkeypatch
):
    """--eval-embeddings/--doc-embeddings: a kept doc whose embedding
    matches an eval vector at cosine ~1 is dropped by the semantic
    screen; unembedded docs pass through untouched (the screen can only
    judge embedded docs); the ANN arm without --embedding-dim is
    rejected at parse time."""
    import numpy as np

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    rng = np.random.default_rng(7)
    docs = [
        (f"https://sem.example/p{i}",
         f"semantic screen corpus document number {i} with unique words "
         f"alpha{i} beta{i} gamma{i}")
        for i in range(12)
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(docs, "url string, text string").write.parquet(src)

    # embed only p0..p7; p0 IS the eval vector, the rest are random units
    def unit(v):
        return (v / np.linalg.norm(v)).astype("float32").tolist()

    vecs = {f"https://sem.example/p{i}": unit(rng.normal(size=16))
            for i in range(8)}
    emb_dir = str(tmp_path / "emb")
    spark.createDataFrame(
        [(u, v) for u, v in vecs.items()], "url string, embedding array<float>"
    ).write.parquet(emb_dir)
    ev_dir = str(tmp_path / "ev")
    spark.createDataFrame(
        [("e0", vecs["https://sem.example/p0"])],
        "eval_id string, embedding array<float>",
    ).write.parquet(ev_dir)

    argv = [
        "--input", src, "--output", str(tmp_path / "o"),
        "--checkpoint", str(tmp_path / "c"),
        "--strategies", "exact",
        "--eval-embeddings", ev_dir, "--doc-embeddings", emb_dir,
        "--semantic-threshold", "0.95",
    ]
    rec = _run(argv, capsys)
    assert "semantic_clean" in rec["stages"]
    kept = {r.url for r in spark.read.parquet(str(tmp_path / "o")).collect()}
    assert "https://sem.example/p0" not in kept
    # every other doc survives: random 16-dim units stay under 0.95,
    # and the four UNembedded docs p8..p11 must pass through
    assert {f"https://sem.example/p{i}" for i in range(1, 12)} <= kept

    import pytest as _pytest

    with _pytest.raises(SystemExit):
        _run(argv + ["--semantic-ann"], capsys)  # no --embedding-dim
    with _pytest.raises(SystemExit):
        _run(["--input", src, "--output", str(tmp_path / "o2"),
              "--checkpoint", str(tmp_path / "c2"),
              "--eval-embeddings", ev_dir], capsys)  # no --doc-embeddings

    # the ANN arm with dim given agrees on this corpus
    argv2 = [
        "--input", src, "--output", str(tmp_path / "o3"),
        "--checkpoint", str(tmp_path / "c3"),
        "--strategies", "exact",
        "--eval-embeddings", ev_dir, "--doc-embeddings", emb_dir,
        "--semantic-threshold", "0.95",
        "--semantic-ann", "--embedding-dim", "16",
    ]
    _run(argv2, capsys)
    kept3 = {r.url for r in spark.read.parquet(str(tmp_path / "o3")).collect()}
    assert "https://sem.example/p0" not in kept3


def test_robots_screen_arm_drops_disallowed_urls(
    spark, tmp_path, capsys, monkeypatch
):
    """--robots: a URL a User-agent:* rule disallows leaves before any
    other stage; allowed siblings and robots-less hosts flow through."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    base = "the quick brown fox jumps over the lazy dog item number"
    docs = (
        [(f"https://rb.example/keep/{i}", f"{base} keep {i}") for i in range(4)]
        + [(f"https://rb.example/private/{i}", f"{base} priv {i}")
           for i in range(3)]
        + [(f"https://other.example/x{i}", f"{base} other {i}")
           for i in range(2)]
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(docs, "url string, text string").write.parquet(src)
    robots_dir = str(tmp_path / "robots")
    spark.createDataFrame(
        [("rb.example", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    ).write.parquet(robots_dir)

    rec = _run(
        ["--input", src, "--output", str(tmp_path / "o"),
         "--checkpoint", str(tmp_path / "c"),
         "--strategies", "exact", "--min-tokens", "3",
         "--robots", robots_dir],
        capsys,
    )
    kept = {r.url for r in spark.read.parquet(str(tmp_path / "o")).collect()}
    assert not [u for u in kept if "/private/" in u]
    assert {f"https://rb.example/keep/{i}" for i in range(4)} <= kept
    assert {f"https://other.example/x{i}" for i in range(2)} <= kept
    assert rec["docs_out"] == 6


def test_export_jsonl_arm(spark, corpus_dir, tmp_path, capsys, monkeypatch):
    """--export-jsonl emits the loader-facing gzip JSONL twin of the
    parquet shards plus a _manifest whose per-shard xor matches a
    recompute over the decoded lines."""
    import glob
    import gzip
    import hashlib

    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    jz = str(tmp_path / "jsonl")
    rec = _run(
        ["--input", corpus_dir, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact,slug", "--n-shards", "3",
         "--export-jsonl", jz],
        capsys,
    )
    assert rec["docs_out"] > 0
    man = {
        r["shard"]: (r["n_docs"], r["content_h"])
        for r in spark.read.parquet(jz + "/_manifest").collect()
    }
    # the jsonl rows ARE the kept corpus, shard by shard
    kept_ids = {r["url"] for r in spark.read.parquet(out_dir).select("url").collect()}
    seen_ids, n_checked = set(), 0
    for d in glob.glob(jz + "/shard=*"):
        shard = int(d.rsplit("=", 1)[1])
        xor, n = 0, 0
        for f in glob.glob(d + "/part-*"):
            if f.endswith(".crc"):
                continue
            with gzip.open(f, "rt", encoding="utf-8") as fh:
                for ln in fh:
                    r = json.loads(ln)
                    seen_ids.add(r["url"])
                    payload = (r["url"] + "\x01" + r["text"]).encode("utf-8")
                    xor ^= int(hashlib.md5(payload).hexdigest()[:12], 16)
                    n += 1
        assert man[shard] == (n, xor)
        n_checked += n
    assert seen_ids == kept_ids and n_checked == rec["docs_out"]


def test_c4_and_gopher_arms(spark, tmp_path, capsys, monkeypatch):
    """--c4-clean rewrites pages to their terminal-punctuated lines and
    drops lorem-ipsum pages whole; --gopher-rules then drops the page
    that is all bullets. The ordinary prose pages survive both."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    prose = "\n".join(
        f"The article paragraph number {j} carries the usual amount of "
        f"plain prose words that have to survive both filters intact."
        for j in range(4)
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(f"u{i}", prose + f"\nUnique closing sentence number {i} ends the page.")
         for i in range(10)]
        + [("lorem", "Lorem ipsum dolor sit amet fills the template page.\n" * 4)]
        + [("menu", prose + "\nMenu")]  # unterminated junk line cleaned away
        + [("bullets", "\n".join(
            f"- bullet item {j} with the usual words here." for j in range(30)))],
        "url string, text string",
    ).write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--c4-clean", "--gopher-rules",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    kept = spark.read.parquet(out_dir)
    ids = {r.url for r in kept.select("url").collect()}
    assert "lorem" not in ids        # C4 page verdict
    assert "bullets" not in ids      # Gopher bullet rule
    assert {f"u{i}" for i in range(10)} <= ids
    # the junk line is cleaned out of the kept page, prose stays
    menu = kept.filter(F.col("url") == "menu").collect()
    assert len(menu) == 1 and "Menu" not in menu[0].text
    assert rec["docs_out"] == len(ids)


def test_token_budgets_arm_keeps_best_until_full(spark, tmp_path, capsys, monkeypatch):
    """--token-budgets keeps the highest-quality docs per lang until the
    token budget fills; the low-quality digit-spam docs go first."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    good = ("the quick brown fox jumps over the lazy dog and then "
            "rests with the pack for a while before running again")
    spam = "4491 8472 9920 1038 5561 7203 9984 2217 6645 3390 8854 1121"
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(f"g{i}", good + f" unique tail {i}", "en") for i in range(10)]
        + [(f"s{i}", spam + f" {i}", "en") for i in range(10)],
        "url string, text string, lang string",
    ).write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    # each good doc ~24 tokens: budget 120 admits ~5 good docs, no spam
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--token-budgets", '{"en": 120}',
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    kept = {r.url for r in spark.read.parquet(out_dir).select("url").collect()}
    assert kept and all(u.startswith("g") for u in kept)
    assert rec["docs_out"] == len(kept) <= 6


def test_token_budgets_exclusive_with_mix(spark, tmp_path, capsys, monkeypatch):
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [("u", "text", "en")], "url string, text string, lang string"
    ).write.mode("overwrite").parquet(src)
    import pytest

    with pytest.raises(SystemExit):
        _run(
            ["--input", src, "--output", str(tmp_path / "o"),
             "--checkpoint", str(tmp_path / "c"),
             "--token-budgets", '{"en": 10}', "--mix-budgets", '{"en": 10}'],
            capsys,
        )


def test_min_host_quality_arm_drops_spam_host(spark, tmp_path, capsys, monkeypatch):
    """--min-host-quality removes every page of the digit-farm host,
    including its one decent-looking page, while the prose host stays."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    good = ("the quick brown fox jumps over the lazy dog and then "
            "rests with the pack for a good long while")
    spam = "4491 8472 9920 1038 5561 7203 9984 2217 6645 3390"
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(f"https://prose.com/{i}", good + f" {i}") for i in range(5)]
        + [(f"https://farm.net/{i}", spam + f" {i}") for i in range(5)]
        + [("https://farm.net/decoy", good)],  # dragged down by its host
        "url string, text string",
    ).write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--min-host-quality", "500000",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    kept = {r.url for r in spark.read.parquet(out_dir).select("url").collect()}
    assert kept == {f"https://prose.com/{i}" for i in range(5)}
    assert rec["docs_out"] == 5


def test_drop_crawler_traps_arm(spark, tmp_path, capsys, monkeypatch):
    """--drop-crawler-traps removes the infinite-calendar family while
    the real content family on the same host survives."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    good = ("the quick brown fox jumps over the lazy dog and then "
            "rests with the pack for a while")
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(f"https://a.com/cal?d={i}", f"{good} calendar {i % 2}")
         for i in range(12)]
        + [(f"https://a.com/post/{i}", f"{good} real post {i}")
           for i in range(6)],
        "url string, text string",
    ).write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--drop-crawler-traps", "8",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    kept = {r.url for r in spark.read.parquet(out_dir).select("url").collect()}
    assert kept == {f"https://a.com/post/{i}" for i in range(6)}
    assert rec["docs_out"] == 6


def test_collapse_revisits_arm(spark, tmp_path, capsys, monkeypatch):
    """--collapse-revisits keeps one newest snapshot per canonical URL:
    the www/scheme respellings and older fetches all leave before dedup."""
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    good = ("the quick brown fox jumps over the lazy dog and rests "
            "with the pack for a while")
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [
            ("https://a.com/page", "2026-01-01", good + " v1"),
            ("https://a.com/page", "2026-03-01", good + " v3"),   # winner
            ("http://www.a.com/page", "2026-02-01", good + " v2"),
            ("https://a.com/other", "2026-01-15", good + " other"),
        ],
        "url string, warc_ts string, text string",
    ).write.mode("overwrite").parquet(src)
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    rec = _run(
        ["--input", src, "--output", out_dir, "--checkpoint", ckpt,
         "--strategies", "exact", "--collapse-revisits", "warc_ts",
         "--min-quality", "0", "--min-tokens", "1",
         "--no-repetition-filter", "--n-shards", "2"],
        capsys,
    )
    kept = {
        (r.url, r.text[-2:])
        for r in spark.read.parquet(out_dir).select("url", "text").collect()
    }
    assert kept == {
        ("https://a.com/page", "v3"),
        ("https://a.com/other", "er"),
    }
    assert rec["docs_out"] == 2
