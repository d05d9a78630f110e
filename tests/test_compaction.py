"""Streaming-state compaction (streaming/compaction.py): the view through
`_read_state`/`read_pairs`/`read_assignments` must be IDENTICAL before and
after compaction, the merged epoch dirs must be gone, the stream must keep
linking new batches against the compacted base, and a crash before the
pointer swap must be invisible."""

from __future__ import annotations

import os

import pytest

from fuzzycat_spark.operators.dedup import DedupConfig, dedup_pages
from fuzzycat_spark.streaming.assignments import read_assignments
from fuzzycat_spark.streaming.compaction import (
    base_pointer,
    compact_state,
    compact_table,
)
from fuzzycat_spark.streaming.dedup_stream import (
    _read_state,
    committed_epoch,
    incremental_dedup_batch,
    read_pairs,
)

FAM = "the quick brown fox jumps over the lazy dog again and again today fine"
ROWS = [
    ("a1", FAM),
    ("a2", FAM + " extra"),
    ("b1", "completely unrelated text about database systems and storage"),
    ("a3", FAM),
    ("b2", "completely unrelated text about database systems and storage!"),
    ("c1", "third family of documents discussing weather patterns in spring"),
    ("a4", FAM + " extra words"),
    ("c2", "third family of documents discussing weather patterns in spring today"),
]
SCHEMA = "url string, text string"
CFG = DedupConfig(strategies=("exact", "slug", "minhash"))


def _drive(spark, tmp, batches):
    index, pairs = f"{tmp}/index", f"{tmp}/pairs"
    for lo, hi in batches:
        b = spark.createDataFrame(ROWS[lo:hi], SCHEMA)
        incremental_dedup_batch(b, index, pairs, CFG)
    return index, pairs


def _pair_set(spark, pairs, index):
    df = read_pairs(spark, pairs, index)
    return {(r.id_a, r.id_b, r.status, r.reason) for r in df.collect()}


def _assign_set(spark, index):
    return {
        (r.id, r.cluster_id) for r in read_assignments(spark, index).collect()
    }


def _epoch_dirs(path):
    if not os.path.isdir(path):
        return []
    return sorted(d for d in os.listdir(path) if d.startswith("epoch="))


def test_compaction_preserves_view_and_sweeps_epochs(spark, tmp_path):
    index, pairs = _drive(spark, tmp_path, ((0, 3), (3, 6), (6, 8)))
    before_pairs = _pair_set(spark, pairs, index)
    before_assign = _assign_set(spark, index)
    committed = committed_epoch(index)
    before_feats = {
        r.id for r in _read_state(spark, index + "_features", committed).collect()
    }
    assert before_pairs and len(before_feats) == len(ROWS)
    assert len(_epoch_dirs(str(pairs))) == 3

    stats = compact_state(spark, index, pairs)
    assert stats["committed"] == committed
    assert stats["tables"]["pairs"]["epochs_merged"] == 3
    assert stats["tables"]["ssgrams"] == {"skipped": "absent"}

    # merged epoch dirs gone, base present, pointer names it
    assert _epoch_dirs(str(pairs)) == []
    assert base_pointer(str(pairs)) == (0, committed)
    assert os.path.isdir(f"{pairs}/_base/gen=0")
    # snapshot tables keep ONLY the committed epoch
    assert _epoch_dirs(f"{index}_sizes") == [f"epoch={committed}"]

    # the consumer view is bit-identical
    assert _pair_set(spark, pairs, index) == before_pairs
    assert _assign_set(spark, index) == before_assign
    after_feats = {
        r.id for r in _read_state(spark, index + "_features", committed).collect()
    }
    assert after_feats == before_feats

    # idempotent re-run: nothing rewrites, view unchanged
    stats2 = compact_state(spark, index, pairs)
    assert (
        stats2["tables"]["pairs"]["skipped"]
        == "already compacted through committed"
    )
    assert _pair_set(spark, pairs, index) == before_pairs


def test_stream_links_through_compacted_base_and_matches_batch(spark, tmp_path):
    """Compact mid-stream, keep feeding batches: cross-boundary duplicates
    (a3/a4 arrive AFTER compaction, their family before) must link through
    the compacted base index, and the final pair set must equal one batch
    dedup over the union — the invariant the un-compacted stream is pinned
    to."""
    index, pairs = _drive(spark, tmp_path, ((0, 3), (3, 5)))
    compact_state(spark, index, pairs)
    for lo, hi in ((5, 6), (6, 8)):
        b = spark.createDataFrame(ROWS[lo:hi], SCHEMA)
        incremental_dedup_batch(b, index, pairs, CFG)

    df = spark.createDataFrame(ROWS, SCHEMA)
    batch_pairs = {
        (r.id_a, r.id_b)
        for r in dedup_pages(df, CFG)[0]
        .filter("status in ('exact','strong')")
        .collect()
    }
    inc_pairs = {
        (r.id_a, r.id_b)
        for r in read_pairs(spark, pairs, index)
        .filter("status in ('exact','strong')")
        .collect()
    }
    assert inc_pairs == batch_pairs
    # a4 (post-compaction) linked into the a-family (pre-compaction)
    assert any("a4" in p for p in inc_pairs)
    # a second compaction folds the tail epochs into gen=1
    compact_state(spark, index, pairs)
    assert base_pointer(str(pairs)) == (1, committed_epoch(index))
    assert not os.path.isdir(f"{pairs}/_base/gen=0")
    assert {
        (r.id_a, r.id_b)
        for r in read_pairs(spark, pairs, index)
        .filter("status in ('exact','strong')")
        .collect()
    } == batch_pairs


def test_compaction_crash_before_pointer_swap_is_invisible(
    spark, tmp_path, monkeypatch
):
    index, pairs = _drive(spark, tmp_path, ((0, 3), (3, 6)))
    before = _pair_set(spark, pairs, index)

    import fuzzycat_spark.streaming.compaction as comp

    def boom(parent, gen, upto):
        raise RuntimeError("killed before pointer swap")

    monkeypatch.setattr(comp, "_write_base_pointer", boom)
    with pytest.raises(RuntimeError):
        compact_table(spark, str(pairs), committed_epoch(index))
    monkeypatch.undo()

    # partial gen dir exists but no pointer names it: view unchanged
    assert base_pointer(str(pairs)) is None
    assert len(_epoch_dirs(str(pairs))) == 2
    assert _pair_set(spark, pairs, index) == before

    # the retry overwrites the partial gen in place and completes
    stats = compact_table(spark, str(pairs), committed_epoch(index))
    assert stats["gen"] == 0 and stats["epochs_merged"] == 2
    assert _pair_set(spark, pairs, index) == before


def test_manifest_prune_and_stale_gen_sweep(spark, tmp_path):
    index, pairs = _drive(spark, tmp_path, ((0, 3), (3, 6), (6, 8)))
    committed = committed_epoch(index)
    stats = compact_state(spark, index, pairs)
    # lineage manifests below the pointer are swept; the committed
    # epoch's manifest stays as the live record
    names = sorted(
        n for n in os.listdir(f"{index}_sizes") if n.startswith("_manifest")
    )
    assert names == [f"_manifest_epoch_{committed}.json"]
    assert stats["tables"]["sizes"]["manifests_pruned"] == 2
    # a stale gen dir (crash after the pointer swap, before step 3) is
    # finished off by the next run even with nothing new to merge
    os.makedirs(f"{pairs}/_base/gen=7")
    before = _pair_set(spark, pairs, index)
    stats2 = compact_state(spark, index, pairs)
    assert stats2["tables"]["pairs"]["gen_dirs_swept"] == 1
    assert not os.path.isdir(f"{pairs}/_base/gen=7")
    assert _pair_set(spark, pairs, index) == before


def test_unreadable_pointed_base_gen_fails_loudly(spark, tmp_path):
    import shutil

    index, pairs = _drive(spark, tmp_path, ((0, 3), (3, 6)))
    compact_state(spark, index, pairs)
    gen, _ = base_pointer(str(pairs))
    shutil.rmtree(f"{pairs}/_base/gen={gen}")
    with pytest.raises(RuntimeError, match="truncated"):
        _read_state(spark, str(pairs), committed_epoch(index))


def test_replay_guard_still_works_on_compacted_state(spark, tmp_path):
    """The committed-epoch replay guard probes the feature state for
    unseen ids — after compaction that probe reads the base. A true
    replay stays a no-op; a fresh-checkpoint batch with new data still
    fails loudly."""
    index, pairs = _drive(spark, tmp_path, ((0, 3), (3, 6)))
    compact_state(spark, index, pairs)
    before = _pair_set(spark, pairs, index)
    committed = committed_epoch(index)

    replay = spark.createDataFrame(ROWS[3:6], SCHEMA)
    incremental_dedup_batch(replay, index, pairs, CFG, epoch_id=committed)
    assert _pair_set(spark, pairs, index) == before

    fresh = spark.createDataFrame([("z9", "never seen before text")], SCHEMA)
    with pytest.raises(RuntimeError, match="unsupported"):
        incremental_dedup_batch(fresh, index, pairs, CFG, epoch_id=0)
