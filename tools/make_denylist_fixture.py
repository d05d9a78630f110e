"""Generate fixtures/denylist_docs.parquet — a corpus that actually
EXERCISES the default web-boilerplate denylist through the gated pipeline
(the round-4 ADVICE finding: the gates modeled the denylist only
vacuously, because no gated corpus contained a denylisted slug).

Shapes planted (all deterministic literals, no RNG):
- a 4-doc denylisted family slugging to "your browser is out of date":
  punctuation/case variants (distinct content hashes, one byte-identical
  pair) — near-identical token streams, so MinHash bands surface the
  pairs and the cascade must answer ambiguous/BLACKLISTED, never
  SLUG_MATCH; the byte-identical pair still links via CONTENT_HASH.
- a 2-doc denylisted family on "the page you requested was not found".
- a real 3-doc content family: two slug-equal variants (star edge) plus
  a token-prefix truncation (CONTAINMENT strong through the cascade).
- unique filler docs.

Run: python tools/make_denylist_fixture.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fuzzycat_spark.functions.denylist import WEB_BOILERPLATE_DENYLIST

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "denylist_docs.parquet")

REAL = (
    "migration of arctic terns spans many thousand kilometers across "
    "open ocean every single year"
)

DOCS: list[str] = [
    # denylisted family 1 (slug: "your browser is out of date")
    "Your browser is out of date!",
    "your browser is out of date...",
    "Your Browser -- Is Out Of Date",
    "Your browser is out of date!",  # byte-identical to doc 0
    # denylisted family 2 (slug: "the page you requested was not found")
    "The page you requested was not found.",
    "THE PAGE YOU REQUESTED WAS NOT FOUND",
    # real content family: slug-equal pair + prefix truncation
    REAL,
    REAL + "!",
    " ".join(REAL.split()[:11]),
    # unique filler
    "the lighthouse keeper logged seventeen storms during the long winter season",
    "quantum annealing hardware struggles with dense constraint graphs in practice",
    "fermented tea cultures require consistent temperature and patient observation daily",
    "volcanic soils on the island produce unusually sweet root vegetables",
    "the archive catalog lists twelve thousand glass plate negatives from expeditions",
    "river otters returned to the delta after decades of absence recently",
    "medieval trade routes crossed the mountain pass only in high summer",
    "the observatory dome rotates on rails greased by hand each month",
]


def main() -> None:
    def slug(t: str) -> str:
        import re

        return re.sub(" +", " ", re.sub("[^a-z0-9]+", " ", t.lower())).strip()

    deny = set(WEB_BOILERPLATE_DENYLIST)
    planted = [slug(t) for t in DOCS[:6]]
    assert all(s in deny for s in planted), planted
    assert not any(slug(t) in deny for t in DOCS[6:])
    # fixed pairs the gate relies on
    assert hashlib.md5(DOCS[0].encode()).hexdigest() == hashlib.md5(DOCS[3].encode()).hexdigest()
    assert slug(DOCS[6]) == slug(DOCS[7])

    table = pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": pa.array(DOCS, pa.string()),
            "lang": pa.array(["en"] * len(DOCS), pa.string()),
        }
    )
    pq.write_table(table, os.path.abspath(OUT))
    print(f"wrote {len(DOCS)} docs -> {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
