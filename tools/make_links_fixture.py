"""Generate fixtures/link_docs.parquet — html pages with a planted host
link graph for the extract_links / host_graph / pagerank gates.

Graph design (hosts, by SURT key):
- portal.example.com  — hub: links out to every content host.
- blog.alpha.org / news.beta.net / docs.gamma.io — a 3-cycle, each also
  linking back to the portal and out to the CDN.
- shop.delta.co.uk — linked only from the portal, links to the CDN.
- static.cdn.com — sink: linked from everywhere, NO outlinks (dangling).
- lonely.zeta.me — source: links out, nothing links in (teleport-base
  score).

Planted parser hazards: uppercase <A HREF>, extra attributes before
href, single-quoted hrefs (ignored by design), relative/fragment/mailto
links (filtered), www./port-80 spellings that collapse to the same SURT
host, a nav/footer block (so the pages also work through the
html->text extractor), multiple links per line.

Deterministic: pure construction, no RNG. Run from the repo root:
    python tools/make_links_fixture.py
"""

from __future__ import annotations

import os

import pandas as pd

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "link_docs.parquet")

PORTAL = "https://portal.example.com"
BLOG = "https://blog.alpha.org"
NEWS = "http://news.beta.net"
DOCS = "https://docs.gamma.io"
SHOP = "https://shop.delta.co.uk"
CDN = "https://static.cdn.com"
LONELY = "https://lonely.zeta.me"


def page(url: str, title: str, links: list[str], extra: str = "") -> dict:
    anchors = "\n".join(
        f'<p>See <a class="x" href="{t}">{i}</a> for more.</p>'
        for i, t in enumerate(links)
    )
    html = f"""<html><head><title>{title}</title></head><body>
<nav><a href="{url}/nav-self">self</a></nav>
<h1>{title}</h1>
{anchors}
{extra}
<footer>&copy; example</footer>
</body></html>"""
    return {"url": url, "html": html, "title": title}


def build() -> pd.DataFrame:
    rows = [
        # portal: 3 pages, hub fan-out (www./:80 spellings collapse)
        page(f"{PORTAL}/", "Portal home",
             [f"{BLOG}/a", f"{NEWS}/a", f"{DOCS}/a", f"{SHOP}/a", f"{CDN}/lib.js"]),
        page(f"{PORTAL}/p2", "Portal listing",
             [f"https://www.blog.alpha.org/b", f"{NEWS}:80/b", f"{CDN}/app.css"],
             extra='<p><A HREF="HTTPS://docs.gamma.io/B">caps</A></p>'),
        page(f"{PORTAL}/p3", "Portal extras",
             [f"{BLOG}/c"],
             extra="<p><a href='https://news.beta.net/sq'>single-quoted "
                   "(ignored by design)</a>"
                   '<a href="/relative">rel</a>'
                   '<a href="#frag">frag</a>'
                   '<a href="mailto:x@y.z">mail</a></p>'
                   # rel-qualified anchors: nofollow/ugc/sponsored flag
                   # true, the noopener-only anchor stays an endorsement.
                   # They DO add 4 to the portal->cdn host-graph weight
                   # and shift absolute pagerank scores (extract_links/
                   # host_graph ignore rel by design) — targets were
                   # chosen at the CDN sink so no TEST-PINNED weight
                   # (portal->blog/news/docs) or relative ordering (cdn
                   # max, portal > shop, lonely/isles teleport-only)
                   # changes; re-check those pins if you retarget these
                   f'<p><a href="{CDN}/nf.js" rel="nofollow">nf</a>'
                   f'<a href="{CDN}/ugc.js" rel="UGC">u</a>'
                   f'<a rel="sponsored noopener" href="{CDN}/sp.js">s</a>'
                   f'<a href="{CDN}/ok.js" rel="noopener external">ok</a></p>'),
        # 3-cycle blog -> news -> docs -> blog, each back to portal + cdn
        page(f"{BLOG}/a", "Blog a", [f"{NEWS}/a", f"{PORTAL}/", f"{CDN}/i.png"]),
        page(f"{BLOG}/b", "Blog b", [f"{NEWS}/b"]),
        page(f"{NEWS}/a", "News a", [f"{DOCS}/a", f"{PORTAL}/"]),
        page(f"{NEWS}/b", "News b", [f"{DOCS}/b", f"{CDN}/i.png"]),
        page(f"{DOCS}/a", "Docs a", [f"{BLOG}/a", f"{PORTAL}/"]),
        page(f"{DOCS}/b", "Docs b", [f"{BLOG}/b", f"{CDN}/d.js"]),
        # shop: portal-only inlink, cdn outlink
        page(f"{SHOP}/a", "Shop", [f"{CDN}/cart.js"]),
        # cdn: dangling sink — a page with no anchors at all
        page(f"{CDN}/about", "CDN about", []),
        # lonely: no inlinks, links out to two hosts
        page(f"{LONELY}/", "Lonely", [f"{PORTAL}/", f"{CDN}/z.js"]),
        # disjoint island: two hosts linking only each other — a second
        # connected component for the host_components gate (and a
        # teleport-only subgraph for pagerank mass checks)
        page("https://isle.east.example/", "Isle east",
             ["https://isle.west.example/x"]),
        page("https://isle.west.example/x", "Isle west",
             ["https://isle.east.example/"]),
    ]
    df = pd.DataFrame(rows)
    df.insert(0, "doc_id", range(1, len(df) + 1))
    return df


if __name__ == "__main__":
    df = build()
    df.to_parquet(OUT, index=False)
    n_links = sum(h.count('href="') + h.count('HREF="') for h in df.html)
    print(f"wrote {OUT}: {len(df)} pages, {n_links} double-quoted hrefs")
