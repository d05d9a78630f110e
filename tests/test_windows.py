"""Batch/streaming parity for windowed event aggregation: the streaming
form (readStream + watermark + window) must produce exactly the batch
form's rows once the stream drains — that parity is the whole contract of
the windows module."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from fuzzycat_spark.streaming.windows import (
    streaming_tumbling_event_stats,
    streaming_user_sessions,
    tumbling_event_stats,
    user_sessions,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EVENTS).cache()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stats_shape(events):
    out = tumbling_event_stats(events)
    rows = out.collect()
    assert sum(r.n_events for r in rows) == events.count()
    assert {r.event_type for r in rows} == {
        r.event_type for r in events.select("event_type").distinct().collect()
    }


def test_user_sessions_counts_cover_all_events(events):
    out = user_sessions(events)
    rows = out.collect()
    assert sum(r.n_events for r in rows) == events.count()
    # every user has at least one session
    assert {r.user_id for r in rows} == {
        r.user_id for r in events.select("user_id").distinct().collect()
    }


@pytest.mark.parametrize(
    "batch_fn,stream_fn,cols",
    [
        (
            tumbling_event_stats,
            streaming_tumbling_event_stats,
            ["win_start", "event_type", "n_events", "total_value"],
        ),
        (
            user_sessions,
            streaming_user_sessions,
            ["user_id", "session_start", "n_events", "total_value"],
        ),
    ],
)
def test_streaming_matches_batch(spark, events, batch_fn, stream_fn, cols):
    out_dir = tempfile.mkdtemp(prefix="win_stream_")
    # FileStreamSource wants a directory of files, not a single parquet file
    src_dir = f"{out_dir}/src"
    import os

    os.makedirs(src_dir)
    shutil.copy(EVENTS, f"{src_dir}/events.parquet")
    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    try:
        q = (
            stream_fn(stream)
            .writeStream.format("memory")
            .queryName(f"win_{batch_fn.__name__}")
            .outputMode("complete")
            .option("checkpointLocation", f"{out_dir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(f"SELECT * FROM win_{batch_fn.__name__}")
        assert _rows(got, cols) == _rows(batch_fn(events), cols)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
