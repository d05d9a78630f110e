"""Generate fixtures/sitemap_docs.parquet (fetched sitemap XML bodies)
and fixtures/sitemap_pages.parquet (the crawled-URL side) for the
sitemap gates (`sitemap_entries`, `sitemap_coverage`).

Planted parse cases: entity-encoded loc (&amp; in a query), CDATA loc,
whitespace-padded loc, absent lastmod/changefreq/priority, a garbage
priority ("high" -> NULL via try-cast), an entry with no <loc> (dropped),
uppercase tag soup, a sitemapindex with two children, and a second host.

Planted coverage cases per host: both / sitemap-only (frontier gap) /
crawled-only (discovery stray), with a sitemap duplicate and a crawl
revisit that must NOT inflate counts (distinct SURT keys).

Run: python tools/make_sitemap_fixture.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

DIR = os.path.join(os.path.dirname(__file__), "..", "fixtures")

A_SITEMAP = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.com/articles/1</loc>
    <lastmod>2026-01-15</lastmod>
    <changefreq>WEEKLY</changefreq>
    <priority>0.8</priority>
  </url>
  <url>
    <loc>https://a.com/search?q=boots&amp;size=9</loc>
  </url>
  <url>
    <loc><![CDATA[https://a.com/cdata/page]]></loc>
    <priority>high</priority>
  </url>
  <URL>
    <LOC>
      https://a.com/padded
    </LOC>
    <lastmod>2026-02-01T10:00:00Z</lastmod>
  </URL>
  <url>
    <lastmod>2026-03-01</lastmod>
  </url>
  <url>
    <loc>https://a.com/gap/unfetched</loc>
    <changefreq>daily</changefreq>
  </url>
  <url>
    <loc>https://a.com/articles/1</loc>
  </url>
</urlset>
"""

A_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://a.com/sitemap-news.xml</loc>
    <lastmod>2026-04-01</lastmod>
  </sitemap>
  <sitemap>
    <loc>https://a.com/sitemap-archive.xml</loc>
  </sitemap>
</sitemapindex>
"""

B_SITEMAP = """<urlset>
  <url><loc>https://b.net/x</loc></url>
  <url><loc>https://b.net/y</loc><priority>0.5</priority></url>
</urlset>
"""

SITEMAPS = [
    ("https://a.com/sitemap.xml", A_SITEMAP),
    ("https://a.com/sitemap_index.xml", A_INDEX),
    ("https://b.net/sitemap.xml", B_SITEMAP),
]

# crawl side: articles/1 fetched twice (revisit variants collapse to one
# SURT key), search page fetched with params reordered, padded + cdata
# pages fetched, gap/unfetched NOT fetched, plus two strays
CRAWLED = [
    "https://a.com/articles/1",
    "http://www.a.com/articles/1",
    "https://a.com/search?size=9&q=boots",
    "https://a.com/cdata/page",
    "https://a.com/padded",
    "https://a.com/stray/only-crawled",
    "https://b.net/x",
    "https://b.net/stray",
]


def main() -> None:
    pq.write_table(
        pa.table(
            {
                "url": pa.array([u for u, _ in SITEMAPS], pa.string()),
                "body": pa.array([b for _, b in SITEMAPS], pa.string()),
            }
        ),
        os.path.join(DIR, "sitemap_docs.parquet"),
    )
    pq.write_table(
        pa.table({"url": pa.array(CRAWLED, pa.string())}),
        os.path.join(DIR, "sitemap_pages.parquet"),
    )
    print(f"wrote {len(SITEMAPS)} sitemaps + {len(CRAWLED)} crawled urls")


if __name__ == "__main__":
    main()
