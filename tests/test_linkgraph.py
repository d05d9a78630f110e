"""Link extraction, host graph, and fixed-point PageRank
(operators/linkgraph.py)."""

import os

import pytest
from pyspark.sql import functions as F

from fuzzycat_spark.operators.linkgraph import (
    anchor_texts,
    extract_links,
    host_graph,
    pagerank_fp,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures", "link_docs.parquet")

SCALE = 1_000_000_000
BASE = 150_000_000  # scale * 15 // 100


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src_host string, dst_host string, weight bigint")


def test_extract_links_filters_and_case(spark):
    pages = spark.read.parquet(FIXTURE)
    links = extract_links(pages).collect()
    dsts = [r.dst_url for r in links]
    # absolute http(s) only: no relative/fragment/mailto/single-quoted
    assert all(d.lower().startswith(("http://", "https://")) for d in dsts)
    assert not any("relative" in d or "frag" in d or "mailto" in d for d in dsts)
    # uppercase <A HREF> captured
    assert "HTTPS://docs.gamma.io/B" in dsts
    # single-quoted href is a documented non-goal
    assert "https://news.beta.net/sq" not in dsts


def test_host_graph_collapses_spellings_and_self_loops(spark):
    pages = spark.read.parquet(FIXTURE)
    g = {(r.src_host, r.dst_host): r.weight for r in host_graph(extract_links(pages)).collect()}
    # www. / :80 / uppercase spellings all collapse onto the SURT host
    assert g[("com,example,portal", "org,alpha,blog")] == 3
    assert g[("com,example,portal", "net,beta,news")] == 2
    assert g[("com,example,portal", "io,gamma,docs")] == 2
    # nav self-links dropped
    assert all(s != d for (s, d) in g)


def test_pagerank_single_edge_hand_computed(spark):
    e = _edges(spark, [("a", "b", 1)])
    got = {r.host: r.score_fp for r in pagerank_fp(e, iters=3, scale=SCALE).collect()}
    # A never receives mass: base from iter 1 on. B's fixed point:
    # base + (base * 85 // 100) = 150M + 127.5M
    assert got["a"] == BASE
    assert got["b"] == BASE + (BASE * 85) // 100 == 277_500_000


def test_pagerank_two_cycle_conserves_mass_exactly(spark):
    e = _edges(spark, [("a", "b", 1), ("b", "a", 1)])
    got = {r.host: r.score_fp for r in pagerank_fp(e, iters=6, scale=SCALE).collect()}
    # symmetric cycle: s = base + 85% * s has fixed point exactly scale
    assert got == {"a": SCALE, "b": SCALE}


def test_pagerank_fixture_graph_ordering(spark):
    pages = spark.read.parquet(FIXTURE)
    scores = {
        r.host: r.score_fp
        for r in pagerank_fp(host_graph(extract_links(pages)), iters=8).collect()
    }
    # the everyone-links-to-it CDN sink outranks every host in its own
    # component; the no-inlink host sits exactly at the teleport base
    island = {"example,east,isle", "example,west,isle"}
    assert scores["com,cdn,static"] == max(
        v for h, v in scores.items() if h not in island
    )
    assert scores["me,zeta,lonely"] == BASE
    # hub portal outranks the cycle members it links to
    assert scores["com,example,portal"] > scores["uk,co,delta,shop"]
    # the disjoint 2-cycle island keeps all its mass: each member holds
    # the per-node stationary score exactly (closed component fixed point)
    assert scores["example,east,isle"] == scores["example,west,isle"]
    assert scores["example,east,isle"] == 1_000_000_000


def test_anchor_texts_strip_markup_and_collapse(spark):
    html = (
        '<p><a href="http://x.com/a"><b>Bold</b>\n\t link</a>'
        '<a href="/rel">rel</a>'
        '<a href="https://y.org/b" class="z">R&amp;D</a>'
        '<a href="http://x.com/c"><img src="i.png"/></a></p>'
    )
    df = spark.createDataFrame([("http://s.com/", html)], "url string, html string")
    got = {(r.dst_url, r.anchor) for r in anchor_texts(df).collect()}
    # markup stripped, whitespace collapsed, entities left as written,
    # relative targets and empty anchors (image-only) dropped
    assert got == {
        ("http://x.com/a", "Bold link"),
        ("https://y.org/b", "R&amp;D"),
    }


def test_anchor_texts_fixture_pairs(spark):
    pages = spark.read.parquet(FIXTURE)
    rows = anchor_texts(pages).collect()
    assert all(r.anchor != "" for r in rows)
    # the uppercase <A HREF> anchor survives with its text
    assert ("HTTPS://docs.gamma.io/B", "caps") in {
        (r.dst_url, r.anchor) for r in rows
    }


def test_pagerank_weights_split_proportionally(spark):
    # a -> b weight 3, a -> c weight 1: b gets 3x c's inbound mass
    e = _edges(spark, [("a", "b", 3), ("a", "c", 1)])
    got = {r.host: r.score_fp for r in pagerank_fp(e, iters=1, scale=SCALE).collect()}
    assert got["b"] - BASE == 3 * (got["c"] - BASE)


def test_pagerank_checkpointer_path_works(spark, tmp_path):
    """The documented checkpointer= parameter: iteration scores
    round-trip through the StageCheckpointer and the fixed point matches
    the uncheckpointed run exactly (integer arithmetic, no drift)."""
    from fuzzycat_spark.operators.linkgraph import pagerank_fp
    from fuzzycat_spark.plans.checkpoint import StageCheckpointer

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1), ("a", "c", 2)],
        "src_host string, dst_host string, weight long",
    )
    plain = pagerank_fp(edges, iters=3)
    ck = StageCheckpointer(spark, str(tmp_path / "ck"))
    checked = pagerank_fp(edges, iters=3, checkpointer=ck)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, checked.collect())
    )


def test_anchor_nofollow_flag(spark):
    """rel token semantics: nofollow/ugc/sponsored (any case, any token
    position, comma or space separated) flag true; noopener/external
    alone stay endorsements; anchors without rel default false."""
    from fuzzycat_spark.operators.linkgraph import anchor_texts

    html = (
        '<a href="http://x.com/1" rel="nofollow">a</a>'
        '<a href="http://x.com/2" rel="UGC">b</a>'
        '<a rel="sponsored noopener" href="http://x.com/3">c</a>'
        '<a href="http://x.com/4" rel="noopener,external">d</a>'
        '<a href="http://x.com/5">e</a>'
    )
    df = spark.createDataFrame([("http://s.com/", html)], "url string, html string")
    got = {r.dst_url: r.nofollow for r in anchor_texts(df).collect()}
    assert got == {
        "http://x.com/1": True,
        "http://x.com/2": True,
        "http://x.com/3": True,
        "http://x.com/4": False,
        "http://x.com/5": False,
    }
    # the fixture's planted rel anchors carry the flag through the gate path
    rows = anchor_texts(spark.read.parquet(FIXTURE)).collect()
    flagged = {r.dst_url for r in rows if r.nofollow}
    assert flagged == {
        "https://static.cdn.com/nf.js",
        "https://static.cdn.com/ugc.js",
        "https://static.cdn.com/sp.js",
    }


def test_anchor_nofollow_ignores_lookalike_attributes(spark):
    """data-rel before the real rel must not shadow it, and 'barrel='
    must not read as rel= — regression for the first-match capture."""
    from fuzzycat_spark.operators.linkgraph import anchor_texts

    html = (
        '<a data-rel="x" href="http://t.com/1" rel="nofollow">a</a>'
        '<a barrel="nofollow" href="http://t.com/2">b</a>'
    )
    df = spark.createDataFrame([("http://s.com/", html)], "url string, html string")
    got = {r.dst_url: r.nofollow for r in anchor_texts(df).collect()}
    assert got == {"http://t.com/1": True, "http://t.com/2": False}
