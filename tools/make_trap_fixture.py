"""Generate fixtures/trap_docs.parquet — planted crawler-trap evidence
for `functions/urls.crawler_traps` (gate `crawler_traps`).

Planted (host, template) verdicts:
- cal.example `/cal?d=N`: 30 URLs, only 3 distinct texts -> trap
  (unbounded calendar pages serving rotating boilerplate).
- cal.example `/post/N`: 10 URLs, 10 distinct texts -> NOT a trap
  (a real content family; template explosion with real content).
- cal.example `/about`: single URL -> below support.
- shop.example `/item/N?color=N`: 12 URLs, 2 texts -> trap (faceted
  search serving the same product page).
- shop.example `/guide/N`: 4 URLs, 4 texts -> not a trap.

Run: python tools/make_trap_fixture.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "trap_docs.parquet"
)


def rows() -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    for i in range(30):
        out.append(
            (
                f"https://cal.example/cal?d=2026-{i:02d}",
                f"calendar boilerplate variant {i % 3}",
            )
        )
    for i in range(10):
        out.append(
            (f"https://cal.example/post/{i}", f"real post number {i} body")
        )
    out.append(("https://cal.example/about", "about page"))
    for i in range(12):
        out.append(
            (
                f"https://shop.example/item/{i}?color={i % 6}",
                f"product page {i % 2}",
            )
        )
    for i in range(4):
        out.append(
            (f"https://shop.example/guide/{i}", f"distinct guide {i} text")
        )
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
