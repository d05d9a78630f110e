"""Tests for the applyInPandasWithState first-touch operator
(streaming/stateful.py): cross-batch accumulation with a stable
first-seen representative, and event-time-timeout state eviction."""

from __future__ import annotations

import datetime as dt

import pytest

from fuzzycat_spark.streaming.stateful import first_seen_stats

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, src, ckpt, out, horizon=None):
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        first_seen_stats(stream, horizon=horizon)
        .writeStream.foreachBatch(
            lambda df, eid: df.write.mode("append").parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def _t(hhmm: str) -> dt.datetime:
    h, m = hhmm.split(":")
    return dt.datetime(2024, 1, 1, int(h), int(m))


def test_first_seen_accumulates_and_representative_is_stable(spark, tmp_path):
    src, ckpt, out = f"{tmp_path}/src", f"{tmp_path}/ckpt", f"{tmp_path}/out"
    # batch 1: user 1 twice (later event id carries the EARLIER ts — the
    # representative must follow event time, not arrival order)
    _write_batch(
        spark,
        src,
        [
            (11, _t("10:05"), 1, "view", 1.0),
            (10, _t("10:00"), 1, "click", 2.0),
            (20, _t("10:01"), 2, "view", 5.0),
        ],
    )
    _drain(spark, src, ckpt, out)
    # batch 2: user 1 again, strictly later — first must NOT move
    _write_batch(spark, src, [(12, _t("10:30"), 1, "error", 4.0)])
    _drain(spark, src, ckpt, out)

    rows = spark.read.parquet(out).collect()
    u1 = sorted(
        [r for r in rows if r.user_id == 1], key=lambda r: r.n_events
    )
    assert [(r.first_event_id, r.n_events, r.total_value) for r in u1] == [
        (10, 2, 3.0),
        (10, 3, 7.0),
    ]
    assert all(r.first_ts == _t("10:00") for r in u1)
    (u2,) = [r for r in rows if r.user_id == 2]
    assert (u2.first_event_id, u2.n_events, u2.total_value) == (20, 1, 5.0)


def test_first_seen_event_time_timeout_evicts_state(spark, tmp_path):
    """A user silent past the horizon is evicted (bounded state) and a
    later reappearance starts a FRESH attribution window."""
    src, ckpt, out = f"{tmp_path}/src", f"{tmp_path}/ckpt", f"{tmp_path}/out"
    hz = "1 hour"
    # batch 1: user 1 and user 99 both active at ~10:00
    _write_batch(
        spark,
        src,
        [(10, _t("10:00"), 1, "view", 1.0), (90, _t("10:00"), 99, "view", 0.5)],
    )
    _drain(spark, src, ckpt, out, horizon=hz)
    # batch 2: only user 99, at 13:00 — advances the watermark to 12:00,
    # past user 1's timeout (10:00 + 1h)
    _write_batch(spark, src, [(91, _t("13:00"), 99, "view", 0.5)])
    _drain(spark, src, ckpt, out, horizon=hz)
    # batch 3: only user 98 — the trigger in which user 1's timeout FIRES
    # (timeouts fire for keys without new data once the watermark passes)
    _write_batch(spark, src, [(80, _t("13:30"), 98, "view", 0.1)])
    _drain(spark, src, ckpt, out, horizon=hz)
    # batch 4: user 1 reappears — state was evicted, so this is a NEW first
    _write_batch(spark, src, [(13, _t("13:45"), 1, "view", 9.0)])
    _drain(spark, src, ckpt, out, horizon=hz)

    u1 = sorted(
        [r for r in spark.read.parquet(out).collect() if r.user_id == 1],
        key=lambda r: r.first_ts,
    )
    assert [(r.first_event_id, r.first_ts, r.n_events, r.total_value) for r in u1] == [
        (10, _t("10:00"), 1, 1.0),
        (13, _t("13:45"), 1, 9.0),  # fresh window: count restarted
    ]


def test_first_seen_rejects_bad_horizon(spark):
    stream_like = spark.createDataFrame([], EVENTS_SCHEMA)
    with pytest.raises(ValueError):
        first_seen_stats(stream_like, horizon="0 hours")
