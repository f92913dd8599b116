"""Event-time streaming aggregations: watermarked tumbling windows,
native session windows, and stateful streaming dedup.

The reference has no streaming surface at all (SURVEY.md §2.8); these are
the operators a continuous training-data pipeline needs. All three work on
*either* a streaming or a batch DataFrame — the plans are identical, which
is what makes them oracle-verifiable: the driver runs them over the batch
``events`` fixture and DuckDB reproduces the window arithmetic.

Scale notes: watermark + tumbling window keeps state bounded to the lateness
horizon; session windows shuffle once on the session key; streaming dedup
state is bounded by the watermark (expired keys are dropped by Spark's state
store GC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_aggregate(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per (window, event_type) count + value sum with a watermark for late
    data. On a stream this emits finalized windows once the watermark
    passes; on a batch frame the watermark is a no-op and the result equals
    the batch GROUP BY — the parity the oracle checks."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window_duration).alias("w"), type_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            type_col,
            "n_events",
            "total_value",
        )
    )


def session_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user sessions via the native ``session_window`` (gap-based,
    merging) — the streaming formulation of sessionization. Works on batch
    frames too, where it matches the lag/cumsum island construction."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("s"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_dedup(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exactly-once-per-key stream: drop rows whose key was already seen
    within the watermark horizon (``dropDuplicatesWithinWatermark`` keeps
    state bounded; plain ``dropDuplicates`` on a stream would grow state
    forever). The streaming face of exact_dedup."""
    if stream.isStreaming:
        return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return stream.dropDuplicates(list(key_cols))


def sliding_aggregate(
    events: DataFrame,
    window_duration: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "4 hours",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Sliding (hopping) windows: each event contributes to
    duration/slide overlapping windows. State per key is bounded by
    (duration/slide) live windows x the watermark horizon. Batch/stream
    plan parity as with tumbling_aggregate."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window_duration, slide).alias("w"), type_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            type_col,
            "n_events",
            "total_value",
        )
    )


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on,
    how: str = "inner",
) -> DataFrame:
    """Stream-static equi-join (enrichment): the static dim is broadcast
    and re-resolved per micro-batch (so a refreshed dim table is picked up
    on the next batch — Structured Streaming's documented semantics). The
    streaming side never shuffles for the join; at scale this is THE way
    to attach dimension attributes to an event stream."""
    return stream.join(F.broadcast(dim), on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    max_delay: str = "30 minutes",
    left_wm: str = "2 hours",
    right_wm: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval: a right row
    matches a left row with the same key when it lands inside
    [left.ts, left.ts + max_delay]. Both sides carry watermarks, which is
    what BOUNDS the join state: Spark can discard a buffered left row
    once the right watermark passes its interval end (and vice versa), so
    state is O(rate x delay window), never the whole history — the only
    formulation of a stream-stream join that survives an unbounded
    stream. Columns are prefixed l_/r_ to keep the output schema stable.

    On batch inputs the same function degrades to a plain interval
    equi-join (the watermark calls are skipped), which is what makes the
    batch-parity oracle possible."""
    l = left
    r = right
    if l.isStreaming:
        l = l.withWatermark(ts_col, left_wm)
    if r.isStreaming:
        r = r.withWatermark(ts_col, right_wm)
    lsel = l.select([F.col(c).alias(f"l_{c}") for c in l.columns])
    rsel = r.select([F.col(c).alias(f"r_{c}") for c in r.columns])
    return lsel.join(
        rsel,
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{ts_col}") >= F.col(f"l_{ts_col}"))
        & (
            F.col(f"r_{ts_col}")
            <= F.col(f"l_{ts_col}") + F.expr(f"INTERVAL {max_delay}")
        ),
    )
