"""Sitemap ingestion at corpus scale: XML sitemap parsing and
sitemap-vs-crawl coverage accounting.

robots.txt (operators/robots.py) carries the publisher's opt-OUTs; the
sitemap carries the opt-INs — the URL inventory the site wants fetched,
with freshness hints. A crawl-derived corpus uses both sides: sitemap
URLs missing from the crawl are frontier gaps, crawled URLs missing
from the sitemap are discovery strays (often the session/tracking
variants the dedup tiers exist to collapse).

Parsing scope (sitemaps.org protocol, the subset real files use):
- `<urlset>` documents yield kind='url' entries; `<sitemapindex>`
  documents yield kind='index' entries (children for the fetcher's next
  round). One document can only be one of the two, but parsing both
  shapes unconditionally handles the malformed-mixed case by just
  emitting what is there.
- Per entry: `<loc>` (required — entries without one are dropped),
  `<lastmod>`, `<changefreq>` (NULL when absent), `<priority>` cast via
  try-cast (NULL when absent or garbage). `<loc>` values get CDATA
  unwrapped and the five standard XML entities decoded — sitemap locs
  legally carry `&amp;` in query strings.
- No XML validator: tag soup in, deterministic rows out (same policy
  as sources/html_extract.py).

Scale shape: sitemap files are hosts-sized (~10^8 against 10^12 pages)
and each parse is a per-row regexp pipeline — no UDF, no shuffle until
the caller aggregates. `sitemap_coverage` reduces both sides to
distinct SURT keys (narrowest possible rows), ONE full-outer equi join
on the key, then a hosts-sized groupBy; the crawled side never carries
text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.urls import surt_key

__all__ = ["sitemap_entries", "sitemap_coverage"]

_URL_BLOCK_RE = r"(?is)<url>(.*?)</url>"
_INDEX_BLOCK_RE = r"(?is)<sitemap>(.*?)</sitemap>"
_LOC_RE = r"(?is)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?is)<lastmod>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ_RE = r"(?is)<changefreq>\s*(.*?)\s*</changefreq>"
_PRIORITY_RE = r"(?is)<priority>\s*(.*?)\s*</priority>"


def _decode(c: Column) -> Column:
    """CDATA unwrap + the five standard XML entities. &amp; must decode
    LAST or it would re-introduce decodable text (`&amp;lt;` means the
    literal string `&lt;`)."""
    c = F.regexp_replace(c, r"(?s)^<!\[CDATA\[(.*)\]\]>$", "$1")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ):
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _entries_of(
    sitemaps: DataFrame, url_col: str, body_col: str, block_re: str, kind: str
) -> DataFrame:
    block = F.explode(
        F.regexp_extract_all(F.col(body_col), F.lit(block_re), F.lit(1))
    ).alias("block")
    raw_loc = F.regexp_extract("block", _LOC_RE, 1)
    return (
        sitemaps.select(F.col(url_col).alias("sitemap_url"), block)
        .filter(raw_loc != "")
        .select(
            "sitemap_url",
            F.lit(kind).alias("kind"),
            _decode(raw_loc).alias("loc"),
            F.nullif(F.regexp_extract("block", _LASTMOD_RE, 1), F.lit("")).alias(
                "lastmod"
            ),
            F.nullif(
                F.lower(F.regexp_extract("block", _CHANGEFREQ_RE, 1)), F.lit("")
            ).alias("changefreq"),
            F.regexp_extract("block", _PRIORITY_RE, 1)
            .try_cast("double")
            .alias("priority"),
        )
    )


def sitemap_entries(
    sitemaps: DataFrame, url_col: str = "url", body_col: str = "body"
) -> DataFrame:
    """(sitemap_url, kind, loc, lastmod, changefreq, priority) for every
    `<url>` (kind='url') and `<sitemapindex>` child (kind='index') in a
    table of fetched sitemap documents. See module docstring for the
    exact parsing subset."""
    return _entries_of(sitemaps, url_col, body_col, _URL_BLOCK_RE, "url").unionAll(
        _entries_of(sitemaps, url_col, body_col, _INDEX_BLOCK_RE, "index")
    )


def sitemap_coverage(
    entries: DataFrame, crawled: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Per-host reconciliation of the sitemap inventory against the
    crawl: (host, n_sitemap, n_crawled, n_both, n_sitemap_only,
    n_crawled_only), counting DISTINCT canonical (SURT) keys so sitemap
    duplicates and crawl revisits don't inflate either side.
    `n_sitemap_only` is the frontier gap; `n_crawled_only` the
    discovery strays."""
    sm = (
        entries.filter(F.col("kind") == "url")
        .select(surt_key("loc").alias("surt"))
        .distinct()
        .withColumn("_s", F.lit(1))
    )
    cr = (
        crawled.select(surt_key(url_col).alias("surt"))
        .distinct()
        .withColumn("_c", F.lit(1))
    )
    both = sm.join(cr, on="surt", how="full_outer")
    in_s = F.col("_s").isNotNull()
    in_c = F.col("_c").isNotNull()
    return (
        both.select(
            F.regexp_extract("surt", r"^([^)]*)", 1).alias("host"),
            in_s.cast("int").alias("s"),
            in_c.cast("int").alias("c"),
        )
        .groupBy("host")
        .agg(
            F.sum("s").cast("long").alias("n_sitemap"),
            F.sum("c").cast("long").alias("n_crawled"),
            F.sum(F.col("s") * F.col("c")).cast("long").alias("n_both"),
            F.sum(F.col("s") * (1 - F.col("c"))).cast("long").alias(
                "n_sitemap_only"
            ),
            F.sum(F.col("c") * (1 - F.col("s"))).cast("long").alias(
                "n_crawled_only"
            ),
        )
    )
