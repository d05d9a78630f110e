"""Batch/streaming parity for windowed event aggregation: the streaming
form (readStream + watermark + window) must produce exactly the batch
form's rows once the stream drains — that parity is the whole contract of
the windows module."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from fuzzycat_spark.streaming.windows import (
    hopping_event_stats,
    streaming_hopping_event_stats,
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
        (
            hopping_event_stats,
            streaming_hopping_event_stats,
            ["win_start", "event_type", "n_events", "total_value"],
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


def test_default_slide_is_exact_half_window():
    """'15 minutes' must default to a 450-second slide (window/2), not the
    old int-division '7 minutes'; '1 hour' must not become '0 hour'; an
    odd-second window has no exact half and must demand an explicit slide."""
    from fuzzycat_spark.streaming.windows import _half_slide

    assert _half_slide("15 minutes") == "450 seconds"
    assert _half_slide("1 hour") == "1800 seconds"
    assert _half_slide("30 minutes") == "900 seconds"
    assert _half_slide("1 day") == "43200 seconds"
    with pytest.raises(ValueError, match="odd"):
        _half_slide("15 seconds")
    with pytest.raises(ValueError, match="unit"):
        _half_slide("15 fortnights")


def test_default_slide_hopping_counts(spark):
    """With the fixed default, every event lands in exactly
    window/slide = 2 hopping windows (the union-of-shifted-tumblings
    property the oracle is stated with)."""
    from pyspark.sql import functions as F

    rows = [(1, "view", 1.0, "2024-01-01 00:03:00"), (2, "view", 1.0, "2024-01-01 00:59:00")]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = hopping_event_stats(df, window="15 minutes")  # default slide
    assert sum(r.n_events for r in out.collect()) == 2 * len(rows)
    out_1h = hopping_event_stats(df, window="1 hour")  # old code raised here
    assert sum(r.n_events for r in out_1h.collect()) == 2 * len(rows)


def test_watermark_drops_late_events(spark):
    """Append-mode streaming with a watermark must DROP an event that
    arrives after the watermark has passed its window's end — the
    bounded-state contract late web-crawl timestamps rely on."""
    import os

    out_dir = tempfile.mkdtemp(prefix="late_")
    src_dir = f"{out_dir}/src"
    os.makedirs(src_dir)
    schema = "event_id long, user_id long, event_type string, value double, ts string"
    base = "2024-01-01 00:{m:02d}:00"
    batch1 = [
        (1, 1, "view", 1.0, base.format(m=5)),
        # 2h later: advances the watermark (1h delay) past window [0,15m)
        (2, 1, "view", 1.0, "2024-01-01 02:00:00"),
    ]
    batch2 = [
        (3, 1, "view", 1.0, base.format(m=7)),   # LATE: window closed -> dropped
        (4, 1, "view", 1.0, "2024-01-01 02:05:00"),  # on time
    ]
    from pyspark.sql import functions as F

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/{name}")
        # FileStreamSource reads files in discovery order; copy into src
        import glob

        src = glob.glob(f"{out_dir}/{name}/part-*.parquet")[0]
        shutil.copy(src, f"{src_dir}/{name}.parquet")

    write_batch(batch1, "b1")
    stream = spark.readStream.schema(
        spark.read.parquet(f"{out_dir}/b1").schema
    ).option("maxFilesPerTrigger", "1").parquet(src_dir)

    def run_drain():
        # memory sink can't resume from a checkpoint; a parquet sink is the
        # durable restart-safe shape production uses
        q = (
            streaming_tumbling_event_stats(stream, watermark="1 hour")
            .writeStream.format("parquet")
            .option("path", f"{out_dir}/sink")
            .outputMode("append")
            .option("checkpointLocation", f"{out_dir}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_drain()
    write_batch(batch2, "b2")
    run_drain()
    rows = {
        (str(r.win_start), r.n_events)
        for r in spark.read.parquet(f"{out_dir}/sink").collect()
    }
    # the 00:00 window was finalized with ONLY event 1 — late event 3 never
    # counted; event 4's window (02:00) is still open, hence not emitted yet
    assert ("2024-01-01 00:00:00", 1) in rows
    assert not any(w.startswith("2024-01-01 00:00") and n == 2 for w, n in rows)
    shutil.rmtree(out_dir, ignore_errors=True)
