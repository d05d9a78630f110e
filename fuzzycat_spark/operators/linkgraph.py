"""Host link graph + fixed-point PageRank — crawl-frontier quality signals.

A web-scale training pipeline wants per-host centrality: Common-Crawl
publishes host-level harmonic/PageRank centrality files and pipelines
use them for crawl prioritization and as a corpus quality prior
(high-centrality hosts are overwhelmingly real sites, spam farms sit in
the low tail). The reference has no analog (fuzzycat consumes metadata
records, not hyperlinks); this generalizes its blocking-key worldview to
the link structure itself.

Three composable pieces:
- `extract_links`: href targets out of raw html (pure Catalyst
  regexp_extract_all, Java-regex/RE2-shared pattern — no lookbehind, no
  backreferences), absolute http(s) only; relative links need a base-URL
  resolver which is out of scope by design.
- `host_graph`: collapse page-level links to a weighted host digraph
  keyed by SURT reversed-label hosts (`functions/urls.surt_host`), self
  loops dropped. ONE partial-aggregated shuffle on the host pair.
- `pagerank_fp`: power iteration with damping, held entirely in int64
  fixed point.

Determinism contract (same reasoning as `operators/lm.py`): float
PageRank sums depend on reduction order, so no oracle could hash-match
them.  Here node mass is an integer (`scale` units per node at t=0) and
each edge contribution is

    contrib(u->v) = s(u) * d_num * w(u,v) DIV (d_den * out_w(u))

— one fused integer division (minimal floor loss), exact and
associative under summation. Each iteration every node restarts from
the teleport base `scale * (d_den - d_num) DIV d_den`; mass lost to
dangling nodes and division floors is NOT redistributed (the usual
normalization is cosmetic for a per-host quality RANKING, and
redistributing it would need a global scalar join per iteration).
Overflow bound: s * d_num * max_w < 2**63 — with the default
scale=1e9 and d_num=85 that allows s*w up to ~1.1e17, far above any
real host's accumulated mass; for 1e8-node graphs with heavy hub
weights choose scale=1e6.

Scale shape:
- Hosts ride shuffles as strings once, in `host_graph`'s single
  aggregation; the iteration loop shuffles only (host, int64) rows.
- Each power iteration is one join of the score vector to the edge
  list keyed by src (sort-merge or broadcast per AQE) plus one
  partial-aggregated groupBy on dst — the canonical Pregel step as
  pure DataFrame ops.
- The loop materializes through `StageCheckpointer` when given one
  (same lineage-cut pattern as `operators/components.py`; chained
  lazy iterations are fine for tens of iterations, but a checkpoint
  every few rounds keeps recovery bounded on 1000-executor runs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.urls import surt_host

__all__ = [
    "HREF_RE",
    "ANCHOR_RE",
    "extract_links",
    "anchor_texts",
    "host_graph",
    "pagerank_fp",
    "teleport_base",
]


def teleport_base(
    scale: int = 1_000_000_000, d_num: int = 85, d_den: int = 100
) -> int:
    """Fixed-point score of a node with no inlinks — and the score to
    impute for hosts absent from the graph entirely (a host nobody
    links to and that links to nobody is exactly the no-inlink case)."""
    return (scale * (d_den - d_num)) // d_den

# lazy [^>]*? so the FIRST href attribute of each anchor wins; identical
# leftmost + lazy semantics under Java regex and RE2. Double-quoted
# values only (the overwhelming majority of real markup; single-quoted
# hrefs are a documented non-goal, as in sources/html_extract.py).
HREF_RE = r'(?i)<a\s[^>]*?href\s*=\s*"([^"]+)"'


def extract_links(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url) per absolute http(s) href occurrence.

    Accepts a string or binary html column (WARC payloads): the JVM-side
    cast decodes invalid UTF-8 to replacement chars, which is harmless
    for href scraping and never crosses an Arrow boundary."""
    dsts = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(HREF_RE), F.lit(1)
    )
    return (
        pages.select(
            F.col(url_col).alias("src_url"), F.explode(dsts).alias("dst_url")
        )
        .filter(F.col("dst_url").rlike(r"^(?i)https?://"))
    )


# whole <a ...>...</a> elements; (?s) so anchors spanning lines match,
# lazy body so nested-anchor-free markup stops at the first close tag
ANCHOR_RE = r'(?is)<a\s[^>]*?href\s*=\s*"([^"]+)"[^>]*>(.*?)</a\s*>'
_WS = r"[ \t\r\n]+"  # explicit class: Java \s includes \x0B, RE2 does not


# rel attribute of the anchor's open tag (double-quoted, same policy as
# href); values whose token list carries any of these mean "link is not
# an endorsement" per the published convention (nofollow + its 2019
# refinements ugc/sponsored) — an endorsement-weighted host graph or
# PageRank run should filter them out
# \s immediately before rel: a bare lazy scan would capture data-rel=
# (first match) or match inside an attribute name like barrel= — every
# real attribute is whitespace-preceded, and the same RE2-safe fix works
# in the DuckDB oracle (no lookbehind available there)
_REL_RE = r'(?is)<a\b[^>]*?\srel\s*=\s*"([^"]*)"'
_NO_ENDORSE = ("nofollow", "ugc", "sponsored")


def anchor_texts(
    pages: DataFrame, *, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url, anchor, nofollow) per absolute-http(s) anchor
    with non-empty link text — the classic web-supervision pairs (anchor
    text describes the TARGET page; search/retrieval training data is
    built from exactly this table). `nofollow` is true when the anchor's
    rel tokens include nofollow/ugc/sponsored: keep those rows for
    anchor-text supervision, but filter them before `host_graph` /
    `pagerank_fp` when the graph should carry only endorsements.

    Inner markup is stripped to spaces and whitespace collapsed; HTML
    entities are left as written (decode downstream with
    `sources/html_extract` if needed). Pure Catalyst: one
    regexp_extract_all over the page plus per-element extracts inside
    a `transform` — no shuffle at all until a consumer aggregates."""
    tag = F.regexp_extract_all(
        F.col(html_col).cast("string"), F.lit(ANCHOR_RE), F.lit(0)
    )
    pairs = F.transform(
        tag,
        lambda t: F.struct(
            F.regexp_extract(t, HREF_RE, 1).alias("dst_url"),
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_extract(
                            t, r"(?is)^<a\b[^>]*>(.*)</a\s*>$", 1
                        ),
                        r"<[^>]+>",
                        " ",
                    ),
                    _WS,
                    " ",
                )
            ).alias("anchor"),
            F.arrays_overlap(
                F.split(
                    F.lower(F.regexp_extract(t, _REL_RE, 1)), r"[ ,\t\r\n]+"
                ),
                F.array(*[F.lit(v) for v in _NO_ENDORSE]),
            ).alias("nofollow"),
        ),
    )
    return (
        pages.select(F.col(url_col).alias("src_url"), F.explode(pairs).alias("p"))
        .select("src_url", "p.dst_url", "p.anchor", "p.nofollow")
        .filter(
            F.col("dst_url").rlike(r"^(?i)https?://") & (F.col("anchor") != "")
        )
    )


def host_graph(links: DataFrame) -> DataFrame:
    """Weighted host digraph (src_host, dst_host, weight) from page-level
    links; self loops and empty hosts dropped."""
    g = links.select(
        surt_host("src_url").alias("src_host"),
        surt_host("dst_url").alias("dst_host"),
    )
    return (
        g.filter(
            (F.col("src_host") != F.col("dst_host"))
            & (F.col("src_host") != "")
            & (F.col("dst_host") != "")
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").alias("weight"))
    )


def pagerank_fp(
    edges: DataFrame,
    *,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    weight_col: str = "weight",
    iters: int = 8,
    d_num: int = 85,
    d_den: int = 100,
    scale: int = 1_000_000_000,
    checkpointer=None,
) -> DataFrame:
    """Damped PageRank over a weighted digraph in int64 fixed point.

    Returns (host, score_fp) for every node appearing as a source or
    destination; score_fp is in `scale` units (an isolated node scores
    the teleport base). See the module docstring for the exact update
    rule, mass accounting, and the overflow bound.
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    )
    # materialize the loop-invariant tables once: lazily the edge plan
    # (often a URL-parse over raw events), the nodes distinct, and the
    # out-weight aggregate are all nested into EVERY iteration of the
    # score chain — 3·iters re-evaluations of upstream work for tables
    # that never change inside the loop. With a checkpointer they land
    # in its resumable dir; ephemeral otherwise. Fixed-point ints
    # round-trip losslessly, so scores are bit-identical.
    if checkpointer is not None:
        e = checkpointer.write(e, "pagerank_edges")
    else:
        from fuzzycat_spark.plans.checkpoint import materialize

        e = materialize(e, "pagerank_edges")
    # nodes/outw stay lazy over the materialized edge parquet: their
    # per-iteration re-evaluation is now a cheap scan+agg, and an A/B
    # showed two more tiny writes cost more than they save on
    # fixture-sized graphs (identical exchanges are also AQE-reusable)
    nodes = (
        e.select(F.col("src").alias("host"))
        .union(e.select(F.col("dst").alias("host")))
        .distinct()
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    base = teleport_base(scale, d_num, d_den)
    scores = nodes.select("host", F.lit(scale).cast("long").alias("s"))
    for i in range(iters):
        contribs = (
            e.join(scores, e["src"] == scores["host"])
            .join(outw, "src")
            .selectExpr(
                "dst AS host",
                f"s * {int(d_num)}L * w DIV ({int(d_den)}L * ow) AS c",
            )
            .groupBy("host")
            .agg(F.sum("c").alias("tot"))
        )
        scores = nodes.join(contribs, "host", "left").select(
            "host",
            (F.lit(base).cast("long") + F.coalesce("tot", F.lit(0))).alias("s"),
        )
        if checkpointer is not None:
            scores = checkpointer.write(scores, f"pagerank_iter_{i}")
    return scores.select("host", F.col("s").alias("score_fp"))
