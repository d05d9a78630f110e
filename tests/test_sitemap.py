"""Sitemap parsing + coverage (`operators/sitemap.py`): every parse
rule hand-pinned on inline XML, coverage arithmetic on planted overlap."""

from __future__ import annotations

from fuzzycat_spark.operators.sitemap import sitemap_coverage, sitemap_entries


def _sm(spark, body: str, url: str = "https://h.com/sitemap.xml"):
    return spark.createDataFrame([(url, body)], "url string, body string")


def test_urlset_fields_parsed(spark):
    body = """<urlset><url>
      <loc>https://h.com/a</loc><lastmod>2026-01-01</lastmod>
      <changefreq>Daily</changefreq><priority>0.7</priority>
    </url></urlset>"""
    r = sitemap_entries(_sm(spark, body)).collect()[0]
    assert (r.kind, r.loc, r.lastmod, r.changefreq, r.priority) == (
        "url",
        "https://h.com/a",
        "2026-01-01",
        "daily",
        0.7,
    )


def test_loc_decoding_and_edge_cases(spark):
    body = """<urlset>
      <url><loc>https://h.com/q?a=1&amp;b=2</loc></url>
      <url><loc><![CDATA[https://h.com/cdata?x=1]]></loc></url>
      <URL><LOC>
        https://h.com/padded
      </LOC></URL>
      <url><lastmod>2026-01-01</lastmod></url>
      <url><loc>https://h.com/bad</loc><priority>high</priority></url>
    </urlset>"""
    rows = {r.loc: r for r in sitemap_entries(_sm(spark, body)).collect()}
    # the loc-less entry is dropped
    assert set(rows) == {
        "https://h.com/q?a=1&b=2",
        "https://h.com/cdata?x=1",
        "https://h.com/padded",
        "https://h.com/bad",
    }
    assert rows["https://h.com/bad"].priority is None


def test_double_encoded_entity_decodes_once(spark):
    # &amp;lt; means the LITERAL text "&lt;" — decoding &amp; last
    # must not re-decode the result
    body = "<urlset><url><loc>https://h.com/?v=&amp;lt;x</loc></url></urlset>"
    r = sitemap_entries(_sm(spark, body)).collect()[0]
    assert r.loc == "https://h.com/?v=&lt;x"


def test_sitemapindex_children(spark):
    body = """<sitemapindex>
      <sitemap><loc>https://h.com/s1.xml</loc><lastmod>2026-02-02</lastmod></sitemap>
      <sitemap><loc>https://h.com/s2.xml</loc></sitemap>
    </sitemapindex>"""
    rows = sitemap_entries(_sm(spark, body)).collect()
    assert {(r.kind, r.loc, r.lastmod) for r in rows} == {
        ("index", "https://h.com/s1.xml", "2026-02-02"),
        ("index", "https://h.com/s2.xml", None),
    }


def test_coverage_counts_distinct_surt_keys(spark):
    body = """<urlset>
      <url><loc>https://h.com/both</loc></url>
      <url><loc>http://www.h.com/both</loc></url>
      <url><loc>https://h.com/gap</loc></url>
    </urlset>"""
    crawled = spark.createDataFrame(
        [
            ("https://h.com/both",),
            ("https://h.com/both/",),  # revisit variant, same key
            ("https://h.com/stray",),
        ],
        "url string",
    )
    r = sitemap_coverage(sitemap_entries(_sm(spark, body)), crawled).collect()
    assert len(r) == 1 and r[0].host == "com,h"
    assert (
        r[0].n_sitemap,
        r[0].n_crawled,
        r[0].n_both,
        r[0].n_sitemap_only,
        r[0].n_crawled_only,
    ) == (2, 2, 1, 1, 1)


def test_index_children_do_not_enter_coverage(spark):
    body = """<sitemapindex>
      <sitemap><loc>https://h.com/child.xml</loc></sitemap>
    </sitemapindex>"""
    crawled = spark.createDataFrame([("https://h.com/child.xml",)], "url string")
    rows = sitemap_coverage(sitemap_entries(_sm(spark, body)), crawled).collect()
    # only the crawled side contributes: the child xml is frontier, not inventory
    assert len(rows) == 1
    assert (rows[0].n_sitemap, rows[0].n_crawled_only) == (0, 1)
