"""Generate fixtures/line_docs.parquet — a multi-line corpus for the
line-level hygiene gates (`line_stats`, `line_dedup`) and the duplicate
n-gram fraction (the sf documents are single-line word soup, where
dup-span signals are vacuously zero).

Planted shapes (all deterministic literals, no RNG):
- three boilerplate lines stamped across >= 4 docs each (cross-doc
  common at min_docs=3): cookie banner, newsletter plea, copyright
  footer;
- a "nothing but boilerplate" doc (line_dedup empties it);
- docs with INTERNAL duplicate lines (dup_line_frac > 0), including one
  whose repeated line is rare corpus-wide (kept by line_dedup — the
  cross-doc and within-doc signals must stay independent);
- a doc with a repeated 5-gram phrase inside its lines (dup-5-gram
  fraction > 0 through the slug tokenizer, which folds newlines into
  spaces);
- an empty doc and a whitespace-only doc (edge rows);
- unique multi-line content docs.

The generator self-asserts every arm is non-vacuous before writing.

Run: python tools/make_line_fixture.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "line_docs.parquet")

COOKIE = "We use cookies to improve your experience. Accept all to continue."
NEWS = "Subscribe to our newsletter for weekly updates."
FOOTER = "Copyright 2024 Example Media Group. All rights reserved."

DOCS: list[str] = [
    # 0: article with all three boilerplate lines around real content
    "\n".join([
        COOKIE,
        "Glacier melt in the high Alps accelerated sharply this decade.",
        "Field teams measured a four meter loss at the tongue of the Aletsch.",
        NEWS,
        FOOTER,
    ]),
    # 1: second article, same boilerplate trio
    "\n".join([
        COOKIE,
        "The harbor festival returns with forty tall ships this September.",
        NEWS,
        "Organizers expect the largest crowd since the centennial year.",
        FOOTER,
    ]),
    # 2: third article — cookie + footer only
    "\n".join([
        COOKIE,
        "A community bakery revived the village square after the mill closed.",
        "Its wood oven burns beech logs from the managed forest nearby.",
        FOOTER,
    ]),
    # 3: fourth article — news + footer
    "\n".join([
        "Night trains between the capitals will run twice daily from March.",
        NEWS,
        FOOTER,
    ]),
    # 4: nothing but boilerplate -> line_dedup empties it
    "\n".join([COOKIE, NEWS, FOOTER]),
    # 5: internal duplicate of a RARE line (kept by line_dedup, but
    # dup_line_frac = 2/4 here)
    "\n".join([
        "The observatory logged a faint aurora at midnight.",
        "Sensor drift was ruled out after calibration.",
        "The observatory logged a faint aurora at midnight.",
        "The observatory logged a faint aurora at midnight.",
    ]),
    # 6: internal duplicate + one common line
    "\n".join([
        "Harvest began early under a dry east wind.",
        "Harvest began early under a dry east wind.",
        COOKIE,
        "Yields held up despite the drought warnings.",
    ]),
    # 7: repeated 5-gram phrase across lines (dup-5-gram > 0), no
    # duplicate full lines
    "\n".join([
        "the committee approved the annual budget without amendments today",
        "after recess the committee approved the annual budget once more",
    ]),
    # 8: empty doc
    "",
    # 9: whitespace-only lines (newlines but no content)
    "\n\n",
    # 10-12: unique clean multi-line docs
    "\n".join([
        "Tidal records from the sound stretch back two centuries.",
        "Clerks marked each spring flood in a leather ledger.",
    ]),
    "\n".join([
        "The violin maker seasons maple for seven years.",
        "Humidity in the workshop never leaves a narrow band.",
    ]),
    "\n".join([
        "Salt pans glow pink where the brine shrimp thrive.",
        "Harvesters rake the crust into low white pyramids.",
    ]),
]


def main() -> None:
    # --- self-checks: every planted arm must be non-vacuous -----------
    per_doc_lines = [
        [ln for ln in text.split("\n") if ln != ""] for text in DOCS
    ]
    from collections import Counter

    doc_freq: Counter[str] = Counter()
    for ls in per_doc_lines:
        for ln in set(ls):
            doc_freq[ln] += 1
    common = {ln for ln, n in doc_freq.items() if n >= 3}
    assert common == {COOKIE, NEWS, FOOTER}, common
    # internal dups exist, and at least one internal-dup line is rare
    assert any(len(ls) != len(set(ls)) for ls in per_doc_lines)
    assert doc_freq["The observatory logged a faint aurora at midnight."] == 1
    # the all-boilerplate doc empties
    assert all(ln in common for ln in per_doc_lines[4])
    # repeated 5-gram: "the committee approved the annual budget" spans
    # both lines of doc 7 once newlines fold to spaces
    toks = " ".join(DOCS[7].split("\n")).split()
    grams = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
    assert len(grams) != len(set(grams)), "no repeated 5-gram planted"
    # empty + whitespace rows present
    assert per_doc_lines[8] == [] and per_doc_lines[9] == []

    table = pa.table(
        {
            "doc_id": pa.array(range(len(DOCS)), pa.int64()),
            "text": pa.array(DOCS, pa.string()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {len(DOCS)} docs -> {OUT}")


if __name__ == "__main__":
    main()
