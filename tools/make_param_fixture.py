"""Generate fixtures/param_docs.parquet — crawl evidence for the
tracking-parameter miner (`functions/urls.mine_tracking_params`,
gate `tracking_params`).

Planted (host, param) verdicts, all deterministic literals:
- tracknews.com `sid`: 6 articles x 3 session-id variants with identical
  text (clean merges), one bare-page target case (`/a/7?sid=x7` vs
  `/a/7`, same text), PLUS 3 search URLs where sid never merges — mixed
  evidence, clean_rate 19/22 ~ 0.86 -> is_tracking TRUE at the 0.8 bar.
- tracknews.com `page`: 5 pagination URLs that DO merge structurally but
  with 5 distinct texts -> zero clean merges -> NOT tracking.
- tracknews.com `q`: distinct residuals, never merges -> NOT tracking.
- tracknews.com `flag`: a no-'=' param whose removal lands on a crawled
  bare page with identical text — clean, but support 1 -> NOT tracking.
- tiny.net `once`: perfectly clean merges but support 2 < min_support 3
  -> NOT tracking.

Run: python tools/make_param_fixture.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "param_docs.parquet"
)


def rows() -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    # sid: session-id variants over identical article bytes
    for i in range(1, 7):
        body = f"article {i} body text for the tracking-param fixture"
        for v in ("a", "b", "c"):
            out.append((f"https://tracknews.com/a/{i}?sid={i}{v}", body))
    # bare-target arm: ?sid=x7 collapses onto the crawled bare page
    body7 = "article 7 body text for the tracking-param fixture"
    out.append(("https://tracknews.com/a/7?sid=x7", body7))
    out.append(("https://tracknews.com/a/7", body7))
    # page: merges structurally, every page's text differs -> dirty
    for i in range(1, 6):
        out.append(
            (f"https://tracknews.com/list?page={i}", f"listing page {i} items")
        )
    # q: distinct residuals (each also carries a sid) -> never merges
    for i in range(1, 4):
        out.append(
            (
                f"https://tracknews.com/search?q=w{i}&sid=s{i}",
                f"search results for w{i}",
            )
        )
    # flag: valueless param, clean bare-target merge, support 1
    promo = "promo landing page"
    out.append(("https://tracknews.com/promo?flag", promo))
    out.append(("https://tracknews.com/promo", promo))
    # once: clean but below min_support
    tiny = "tiny page"
    out.append(("https://tiny.net/x?once=1", tiny))
    out.append(("https://tiny.net/x?once=2", tiny))
    return out


def main() -> None:
    data = rows()
    table = pa.table(
        {
            "url_id": pa.array(range(len(data)), pa.int64()),
            "url": pa.array([u for u, _ in data], pa.string()),
            "text": pa.array([t for _, t in data], pa.string()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {len(data)} urls -> {OUT}")


if __name__ == "__main__":
    main()
