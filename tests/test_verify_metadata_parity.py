"""Golden parity test: run our metadata verify cascade against the
reference's own 318-row verify.csv over its 421 release fixtures
(`/root/reference/tests/data/`), with the same pass criteria as
`tests/test_verify.py:51-80` — status must match, reason matched
case-insensitively when specified, `todo` rows skipped.

The reference tree is read-only test DATA here (fixtures + blacklists);
the cascade implementation is fuzzycat_spark.operators.verify_metadata.
"""

from __future__ import annotations

import csv
import importlib.util
import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fuzzycat_spark.operators.verify_metadata import (
    record_features,
    verify_metadata_pairs,
)

REF = "/root/reference"
RELEASE_DIR = f"{REF}/tests/data/release"
VERIFY_CSV = f"{REF}/tests/data/verify.csv"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RELEASE_DIR), reason="reference fixtures not present"
)

REF_SCHEMA = StructType(
    [
        StructField("ident", StringType()),
        StructField("work_id", StringType()),
        StructField("title", StringType()),
        StructField("release_type", StringType()),
        StructField("release_year", LongType()),
        StructField("container_id", StringType()),
        StructField("pages", StringType()),
        StructField(
            "ext_ids",
            StructType(
                [
                    StructField("doi", StringType()),
                    StructField("pmid", StringType()),
                    StructField("pmcid", StringType()),
                    StructField("arxiv", StringType()),
                    StructField("jstor", StringType()),
                ]
            ),
        ),
        StructField(
            "contribs",
            ArrayType(StructType([StructField("raw_name", StringType())])),
        ),
        StructField(
            "extra",
            StructType(
                [
                    StructField("container_name", StringType()),
                    StructField("subtitle", ArrayType(StringType())),
                    StructField(
                        "crossref", StructType([StructField("type", StringType())])
                    ),
                    StructField(
                        "datacite",
                        StructType(
                            [
                                StructField("metadataVersion", StringType()),
                                StructField(
                                    "relations",
                                    ArrayType(
                                        StructType(
                                            [
                                                StructField("relationType", StringType()),
                                                StructField("relatedIdentifier", StringType()),
                                                StructField(
                                                    "relatedIdentifierType", StringType()
                                                ),
                                            ]
                                        )
                                    ),
                                ),
                            ]
                        ),
                    ),
                ]
            ),
        ),
    ]
)


def _load_blacklists():
    spec = importlib.util.spec_from_file_location("ref_data", f"{REF}/fuzzycat/data.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return sorted(mod.TITLE_BLACKLIST), sorted(mod.TITLE_FRAGMENT_BLACKLIST)


@pytest.fixture(scope="module")
def parity(spark):
    raw = (
        spark.read.schema(REF_SCHEMA)
        .option("multiLine", "true")
        .json(f"{RELEASE_DIR}/*")
    )
    records = raw.select(
        "ident",
        "work_id",
        "title",
        "release_type",
        "release_year",
        "container_id",
        "pages",
        "ext_ids",
        "contribs",
        F.struct(
            F.col("extra.container_name").alias("container_name"),
            F.col("extra.subtitle").alias("subtitle"),
            F.col("extra.crossref.type").alias("crossref_type"),
            F.col("extra.datacite.metadataVersion").alias("datacite_metadataVersion"),
            F.col("extra.datacite.relations").alias("datacite_relations"),
        ).alias("extra"),
    )

    golden = []
    with open(VERIFY_CSV) as f:
        for row in csv.reader(f):
            a, b, status, reason = row
            status = status.replace("Status.", "").strip().lower()
            if not status or status == "todo":
                continue
            golden.append((a, b, status, reason.strip().lower()))

    pairs = spark.createDataFrame(
        [(a, b) for a, b, _, _ in golden], "id_a string, id_b string"
    )
    title_bl, frag_bl = _load_blacklists()
    feats = record_features(records).localCheckpoint()
    got = {
        (r.id_a, r.id_b): (r.status, r.reason)
        for r in verify_metadata_pairs(
            pairs, feats, title_blacklist=title_bl, fragment_blacklist=frag_bl
        ).collect()
    }
    return golden, got


def test_verify_metadata_golden_parity(parity):
    golden, got = parity
    mismatches = []
    for a, b, want_status, want_reason in golden:
        status, reason = got[(a, b)]
        if status != want_status or (want_reason and reason.lower() != want_reason):
            mismatches.append((a, b, want_status, want_reason, status, reason))
    rate = 1 - len(mismatches) / len(golden)
    detail = "\n".join(
        f"  {a[:8]}/{b[:8]}: want {ws}/{wr} got {s}/{r}"
        for a, b, ws, wr, s, r in mismatches[:20]
    )
    assert not mismatches, (
        f"parity {rate:.3f} over {len(golden)} golden pairs; mismatches:\n{detail}"
    )
