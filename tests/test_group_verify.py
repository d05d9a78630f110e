"""GroupVerifier graft: cluster screens + pair enumeration + cascade over
the reference's own release fixtures (read-only test DATA)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fuzzycat_spark.operators.verify_metadata import group_verify

RELEASE_DIR = "/root/reference/tests/data/release"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RELEASE_DIR), reason="reference fixtures not present"
)


@pytest.fixture(scope="module")
def releases(spark):
    from tests.test_verify_metadata_parity import REF_SCHEMA

    raw = (
        spark.read.schema(REF_SCHEMA)
        .option("multiLine", "true")
        .json(f"{RELEASE_DIR}/*")
        .filter(F.col("ident").isNotNull())
    )
    # FIXTURES.md §2 flattened `extra` (same shape the parity test feeds
    # record_features)
    return raw.select(
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
    ).cache()


def test_group_verify_screens_and_pairs(releases):
    from fuzzycat_spark.operators.verify_metadata import slugify_string

    keyed = releases.withColumn("grp_key", slugify_string(F.col("title")))
    verified, counters = group_verify(
        keyed, key_col="grp_key", max_cluster_size=6
    )
    cnt = {r.reason: r.n for r in counters.collect()}
    # cluster screens always reported (0 allowed), mirroring the Counter
    for screen in (
        "SINGULAR_CLUSTER",
        "MAX_CLUSTER_SIZE_EXCEEDED",
        "CONTAINER_NAME_BLACKLIST",
        "PUBLISHER_BLACKLIST",
    ):
        assert screen in cnt
    assert cnt["SINGULAR_CLUSTER"] > 0  # most fixture titles are unique
    rows = verified.collect()
    assert all(
        r.status in ("exact", "strong", "weak", "different", "ambiguous")
        for r in rows
    )
    # same-slug-title fixtures exist, so some pairs must surface
    assert len(rows) > 0
    # pair counts of verified reasons are in the counter union too
    reason_counts = {
        r.reason: r.n for r in counters.collect() if r.reason not in cnt or True
    }
    for r in rows:
        assert r.reason in reason_counts


def test_group_verify_is_single_action_with_exact_blacklist_counts(
    releases, monkeypatch
):
    """The screens/blacklist counters must ride the pair-materialization
    job as Observations — no .count()/.first()/.collect() driver actions
    inside group_verify — and the per-side blacklist count must equal the
    reference's side-loop semantics: a flagged member of an n-cluster is
    seen in n-1 pairs."""
    import pyspark.sql.dataframe as dataframe_mod

    idents = [r.ident for r in releases.select("ident").limit(3).collect()]
    keyed = releases.withColumn(
        "grp_key",
        F.when(F.col("ident").isin(idents), F.lit("forced-group")).otherwise(
            F.concat(F.lit("solo-"), F.col("ident"))
        ),
    ).withColumn(
        "publisher",
        F.when(F.col("ident") == idents[0], F.lit("Test Accounts")),
    )

    def _forbid(name):
        def inner(self, *a, **k):
            raise AssertionError(f"driver action DataFrame.{name} inside group_verify")
        return inner

    for name in ("count", "first", "collect", "head", "take"):
        monkeypatch.setattr(dataframe_mod.DataFrame, name, _forbid(name))
    verified, counters = group_verify(keyed, key_col="grp_key", max_cluster_size=6)
    monkeypatch.undo()

    cnt = {r.reason: r.n for r in counters.collect()}
    # one flagged member of the forced 3-cluster appears in 3-1=2 pairs
    assert cnt["PUBLISHER_BLACKLIST"] == 2
    assert cnt["CONTAINER_NAME_BLACKLIST"] == 0
    # every other record is a singleton cluster
    assert cnt["SINGULAR_CLUSTER"] == releases.count() - 3
    assert cnt["MAX_CLUSTER_SIZE_EXCEEDED"] == 0
    got_pairs = {(r.id_a, r.id_b) for r in verified.collect()}
    a, b, c = sorted(idents)
    assert got_pairs == {(a, b), (a, c), (b, c)}
