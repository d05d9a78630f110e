"""Generate fixtures/eval_docs.parquet — a small benchmark-style eval set
for the decontamination gate.

Planted shapes:
- "leaky" prompts embedding 5-gram spans that genuinely occur in BOTH
  /root/testdata/sf0.001 and sf0.01 documents (picked deterministically:
  the lexicographically first shared 5-grams), so the gate's
  `contaminated` verdict is non-vacuous at both gated scale factors;
- "clean" prompts built from vocabulary the synthetic corpus never uses
  (zero hits by construction).

The generator recomputes the shared-gram set from the testdata and
asserts every planted arm is non-vacuous before writing.

Run: python tools/make_eval_fixture.py
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "eval_docs.parquet")
N = 5
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


def shared_grams() -> list[str]:
    con = duckdb.connect()
    sets = []
    for d in SF_DIRS:
        q = f"""
        WITH t AS (SELECT string_split(text, ' ') AS ws
                   FROM '{d}/documents.parquet'),
        g AS (SELECT DISTINCT unnest(list_transform(
                range(1, len(ws) - {N} + 2),
                i -> array_to_string(ws[i:i+{N - 1}], ' '))) AS g
              FROM t WHERE len(ws) >= {N})
        SELECT g FROM g"""
        sets.append({r[0] for r in con.sql(q).fetchall()})
    return sorted(sets[0] & sets[1])


# words absent from the synthetic corpus vocabulary
CLEAN_PROMPTS = [
    "translate the following sentence into braille notation please",
    "which chemical element has the atomic number seventy nine",
    "summarize the plot of an imaginary opera about lighthouse keepers",
]


def main() -> None:
    grams = shared_grams()
    assert len(grams) >= 4, f"only {len(grams)} shared {N}-grams"
    leaky = [
        f"complete the passage {grams[0]} and explain the result",
        f"answer with one word {grams[1]} is the expected phrase",
        f"{grams[2]} appeared in the training corpus verbatim",
        f"two leaks here {grams[3]} plus also {grams[0]} again",
    ]
    texts = leaky + CLEAN_PROMPTS
    # self-check: leaky prompts contain a shared gram, clean ones don't
    all_shared = set(grams)

    def doc_grams(t: str) -> set[str]:
        ws = t.split()
        return {" ".join(ws[i : i + N]) for i in range(len(ws) - N + 1)}

    for t in leaky:
        assert doc_grams(t) & all_shared, t
    for t in CLEAN_PROMPTS:
        assert not (doc_grams(t) & all_shared), t

    table = pa.table(
        {
            "eval_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {len(texts)} eval rows ({len(leaky)} leaky) -> {OUT}")


if __name__ == "__main__":
    main()
