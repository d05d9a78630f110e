"""Generate fixtures/url_docs.parquet — messy URL variants for the SURT
canonicalization gates (`url_canonical`, `url_dup_pairs`).

Planted families (deterministic literals):
- A: one resource under scheme/www/default-port/fragment variants;
- B: tracking-param and param-order variants of one search URL;
- C: index.html / trailing-slash variants of one directory;
- non-collapsing lookalikes: different subdomain, different param
  VALUES, case-different paths, a non-default port (kept);
- odd shapes: scheme-less, IPv4 host, bare domain, query-only page.

Run: python tools/make_url_fixture.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "url_docs.parquet")

URLS: list[str] = [
    # family A — all collapse to com,example)/articles/42
    "http://example.com/articles/42",
    "https://example.com/articles/42",
    "https://www.example.com/articles/42",
    "https://example.com:443/articles/42#section-3",
    "http://example.com:80/articles/42/",
    # family B — all collapse to com,shop)/search?q=boots&size=9
    "https://shop.com/search?q=boots&size=9",
    "https://shop.com/search?size=9&q=boots",
    "https://shop.com/search?q=boots&utm_source=mail&size=9&utm_campaign=x",
    "https://shop.com/search?fbclid=ABC123&size=9&q=boots",
    # family C — all collapse to org,library)/catalog
    "https://library.org/catalog/",
    "https://library.org/catalog/index.html",
    "http://www.library.org/catalog///",
    # non-collapsing lookalikes (each a singleton)
    "https://blog.example.com/articles/42",      # different subdomain
    "https://shop.com/search?q=boots&size=10",   # different value
    "https://example.com/Articles/42",           # path case differs
    "https://example.com:8080/articles/42",      # non-default port kept
    # odd shapes
    "example.com/articles/42",                   # scheme-less -> joins A
    "http://192.168.0.1/status",
    "https://example.com",                       # bare domain
    "https://example.com/?ref=twitter",          # tracking-only query
]


# (url, canonical href) rows for the rel=canonical edge gate
# (`canonical_pairs`): the publisher-declared dedup hints
# page_directives extracts, resolved against the page URL.
CANONICAL_ROWS: list[tuple[str, str | None]] = [
    # AMP variant → absolute canonical into family A
    ("https://amp.example.com/articles/42/amp",
     "https://example.com/articles/42"),
    # print view → root-relative canonical (origin of its own page)
    ("https://example.com/articles/42/print", "/articles/42"),
    # protocol-relative canonical into family B's target
    ("https://m.shop.com/search?q=boots&size=9",
     "//shop.com/search?q=boots&size=9"),
    # self-canonical (hygiene no-op — must emit NO edge)
    ("https://library.org/catalog/", "https://library.org/catalog/"),
    # canonical pointing at an uncrawled page — no edge
    ("https://example.com/orphan", "https://nowhere.example.net/x"),
    # document-relative href — unresolvable by design, no edge
    ("https://example.com/relative", "sibling-page.html"),
]


def main() -> None:
    # family A collapses with the scheme-less variant -> 6 members;
    # bare domain + tracking-only query both reduce to com,example) -> 2
    urls = URLS + [u for u, _ in CANONICAL_ROWS]
    canonicals = [None] * len(URLS) + [c for _, c in CANONICAL_ROWS]
    table = pa.table(
        {
            "url_id": pa.array(range(len(urls)), pa.int64()),
            "url": pa.array(urls, pa.string()),
            "canonical": pa.array(canonicals, pa.string()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {len(urls)} urls -> {OUT}")


if __name__ == "__main__":
    main()
