"""Generate fixtures/revisit_docs.parquet for the latest_revision gate:
crawl revisits of the same canonical page under different URL spellings
and timestamps.

Arms (self-asserted): multi-revision pages whose newest snapshot wins,
a timestamp TIE broken by lowest id, single-fetch pages (n_revisions=1),
and spelling variants (www/scheme/tracking-param/index-page) that must
collapse to one canonical key.
Run: python tools/make_revisit_fixture.py
"""

from __future__ import annotations

from datetime import datetime

import pandas as pd

T = lambda s: datetime.fromisoformat(s)  # noqa: E731

ROWS = [
    # page A: four revisits under four spellings; newest is r03
    (0, "https://example.com/news/story", T("2026-01-01T00:00:00")),
    (1, "http://www.example.com/news/story", T("2026-03-01T12:00:00")),
    (2, "https://example.com/news/story?utm_source=feed", T("2026-02-01T00:00:00")),
    (3, "https://example.com:443/news/story/", T("2026-05-01T09:30:00")),
    # page B: timestamp tie -> lowest id (4) wins
    (4, "https://tie.example.org/page", T("2026-04-01T00:00:00")),
    (5, "http://tie.example.org/page/index.html", T("2026-04-01T00:00:00")),
    # page C: single fetch
    (6, "https://solo.example.net/only/one", T("2026-01-15T08:00:00")),
    # page D: two revisits, newer first in file order
    (7, "https://d.example.com/x?b=2&a=1", T("2026-06-01T00:00:00")),
    (8, "https://d.example.com/x?a=1&b=2", T("2026-05-31T23:59:59")),
]


def main() -> None:
    df = pd.DataFrame(ROWS, columns=["url_id", "url", "warc_ts"])
    # microsecond precision: Spark cannot read TIMESTAMP(NANOS) parquet
    df["warc_ts"] = df["warc_ts"].astype("datetime64[us]")
    groups = {  # canonical page -> expected winner id, expected count
        "A": ([0, 1, 2, 3], 3, 4),
        "B": ([4, 5], 4, 2),
        "C": ([6], 6, 1),
        "D": ([7, 8], 7, 2),
    }
    assert sum(len(g[0]) for g in groups.values()) == len(ROWS)
    df.to_parquet("/root/repo/fixtures/revisit_docs.parquet", index=False)
    print(f"wrote {len(ROWS)} revisits over {len(groups)} canonical pages")


if __name__ == "__main__":
    main()
