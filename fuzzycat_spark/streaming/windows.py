"""Windowed event aggregation: tumbling-window stats and sessionization.

The reference has no streaming/eventing story at all (batch rebuilds per
run, `/root/reference/notes/2021_09_review.md:97-101`); a training-data
pipeline needs windowed rollups over its ingest/telemetry stream. Both
operators exist in a batch form (oracle-checkable against DuckDB
gaps-and-islands SQL) and a streaming form (same expressions over
readStream + watermark) — the batch/stream parity IS the test.

Scale notes: tumbling windows aggregate with map-side partial combine on
(window, type) — one shuffle sized by cardinality of the group space, not
the event count. Session windows shuffle by user_id (Spark's
session_window merge is per-key); watermarks bound streaming state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WINDOW = "15 minutes"
DEFAULT_GAP = "30 minutes"

_UNIT_SECONDS = {
    "second": 1,
    "seconds": 1,
    "minute": 60,
    "minutes": 60,
    "hour": 3600,
    "hours": 3600,
    "day": 86400,
    "days": 86400,
}


def _interval_seconds(interval: str) -> int:
    value, unit = interval.strip().split()
    try:
        secs = int(value) * _UNIT_SECONDS[unit.lower()]
    except KeyError:
        raise ValueError(f"unsupported interval unit in {interval!r}") from None
    if secs <= 0:
        raise ValueError(f"interval must be positive: {interval!r}")
    return secs


def _half_slide(window: str) -> str:
    """Exact window/2 as a seconds interval — '15 minutes' -> '450 seconds'.

    Naive `int(value)//2` on the original unit turns '15 minutes' into
    '7 minutes' (breaking the union-of-k-shifted-tumblings equivalence the
    hopping oracle states) and '1 hour' into the invalid '0 hour'; halving
    in seconds is exact for every even-second window. An odd-second window
    (e.g. '15 seconds') has no exact half — require an explicit slide.
    """
    secs = _interval_seconds(window)
    if secs % 2:
        raise ValueError(
            f"window {window!r} is an odd number of seconds; pass slide= explicitly"
        )
    return f"{secs // 2} seconds"


def tumbling_event_stats(
    events: DataFrame, window: str = DEFAULT_WINDOW, ts_col: str = "ts"
) -> DataFrame:
    """(win_start, event_type, n_events, total_value) per tumbling window.

    Epoch-aligned windows (same origin as DuckDB's time_bucket)."""
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "total_value")
    )


def user_sessions(
    events: DataFrame, gap: str = DEFAULT_GAP, ts_col: str = "ts"
) -> DataFrame:
    """(user_id, session_start, n_events, total_value) — session = maximal
    run of a user's events with strictly-less-than-`gap` spacing (Spark's
    session_window merge semantics; the DuckDB oracle mirrors it with a
    gaps-and-islands lag/cumsum)."""
    return (
        events.groupBy("user_id", F.session_window(ts_col, gap).alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def hopping_event_stats(
    events: DataFrame,
    window: str = DEFAULT_WINDOW,
    slide: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """(win_start, event_type, n_events, total_value) per HOPPING window
    (length = `window`, stride = `slide`, default window/2) — the sliding
    rollup a rate-monitoring surface reads. Each event lands in
    length/stride windows; Spark's window() emits them without an
    explicit explode. With length = k*stride the result equals the union
    of k stride-shifted tumbling aggregations, which is exactly how the
    DuckDB oracle states it (no lateral unnest needed).
    """
    slide = slide or _half_slide(window)
    return (
        events.groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events", "total_value"
        )
    )


def streaming_tumbling_event_stats(
    stream: DataFrame,
    window: str = DEFAULT_WINDOW,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming form of tumbling_event_stats: identical aggregation over a
    watermarked stream; late rows beyond `watermark` are dropped and window
    state is bounded by it. Sink in append mode emits a window when the
    watermark passes its end."""
    # watermarks require TIMESTAMP; parquet event time is often NTZ —
    # cast under the (UTC) session zone, same wall instant
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "total_value")
    )


def streaming_hopping_event_stats(
    stream: DataFrame,
    window: str = DEFAULT_WINDOW,
    slide: str | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming form of hopping_event_stats (watermarked; append mode
    emits each window once the watermark passes its end)."""
    slide = slide or _half_slide(window)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"), "event_type", "n_events", "total_value"
        )
    )


def streaming_user_sessions(
    stream: DataFrame,
    gap: str = DEFAULT_GAP,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via session_window + watermark (state for a
    session is emitted once the watermark passes its close)."""
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy("user_id", F.session_window(ts_col, gap).alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )
