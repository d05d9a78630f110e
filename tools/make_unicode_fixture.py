"""Generate the committed non-Latin slug fixture
(`fixtures/unicode_docs.parquet`).

Deterministic dup families in Greek, Cyrillic, CJK, and accomposed/
decomposed accented Latin whose members are IDENTICAL under the full
Unicode slugifier (NFKD + category strip + lowercase + whitespace
collapse) but distinct under the ASCII fold — the corpus shape the
reference's sandcrawler normalizer exists for
(`/root/reference/fuzzycat/sandcrawler.py:5-64`).

The `uslug` column is the scalar `unicode_slugify` output precomputed at
GENERATION time; the driver's DuckDB oracle reads it as golden data, so
the gate checks Spark's distributed Arrow-batched UDF path (and its key
grouping) against the scalar reference on every row. Re-run this script
only when the slugifier semantics intentionally change.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fuzzycat_spark.functions.normalize import unicode_slugify  # noqa: E402

# family -> list of texts that must unicode-slug to the SAME key
FAMILIES: list[list[str]] = [
    # Greek: case + tonos accents + punctuation
    [
        "Η Ελλάδα είναι μια όμορφη χώρα με μεγάλη ιστορία",
        "η ελλαδα ειναι μια ομορφη χωρα με μεγαλη ιστορια",
        "Η ΕΛΛΆΔΑ ΕΊΝΑΙ ΜΙΑ ΌΜΟΡΦΗ ΧΏΡΑ, ΜΕ ΜΕΓΆΛΗ ΙΣΤΟΡΊΑ!",
    ],
    # Cyrillic: case + punctuation
    [
        "Москва является столицей Российской Федерации",
        "МОСКВА ЯВЛЯЕТСЯ СТОЛИЦЕЙ РОССИЙСКОЙ ФЕДЕРАЦИИ",
        "«Москва» — является, столицей: Российской Федерации.",
    ],
    # CJK: ideographic punctuation + fullwidth ASCII forms
    [
        "東京は日本の首都です。ＡＢＣ１２３",
        "東京は日本の首都です ABC123",
        "東京は日本の首都です、abc123！",
    ],
    # accented Latin: precomposed vs combining-mark decomposed vs case
    [
        "Café résumé naïve façade",
        "Café résumé naïve façade",
        "CAFÉ RÉSUMÉ NAÏVE FAÇADE",
    ],
    # mixed-script family (Greek + Latin digits, width variants)
    [
        "Αθήνα 2024 marathon αποτελέσματα",
        "ΑΘΗΝΑ ２０２４ marathon ΑΠΟΤΕΛΕΣΜΑΤΑ",
    ],
]

SINGLETONS = [
    "Θεσσαλονίκη λιμάνι της Μακεδονίας",
    "Санкт-Петербург культурная столица",
    "京都は歴史的な都市です",
    "Zürich liegt an der Limmat",
    "plain ascii text with no diacritics at all",
]


def main(out: str = "fixtures/unicode_docs.parquet") -> None:
    rows = []
    doc_id = 0
    for fam_id, fam in enumerate(FAMILIES):
        slugs = {unicode_slugify(t) for t in fam}
        assert len(slugs) == 1, f"family {fam_id} does not slug-agree: {slugs}"
        for t in fam:
            rows.append((doc_id, t, unicode_slugify(t), fam_id))
            doc_id += 1
    for t in SINGLETONS:
        rows.append((doc_id, t, unicode_slugify(t), -1))
        doc_id += 1
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "uslug": pa.array([r[2] for r in rows], pa.string()),
            "family_id": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out)
    print(f"wrote {len(rows)} rows to {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
