"""Event-time windowed aggregation with watermarks (streaming form of
plans/analytics.py events_tumbling_window / events_sliding_window).

The reference cannot represent late data at all — it stamps arrival time
(mqtt2sql.py:522), so lateness is unrepresentable (SURVEY.md §2 C).  This
module is the event-time generalization: tumbling/sliding/session windows
over the payload's own timestamps, with watermark-bounded state.

State sizing at 100 TB (SURVEY.md §7.1 M6): state per key-window lives
until watermark passes window end, so state size ≈ (keys × windows inside
the watermark horizon) — bound the horizon, not the throughput.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    window: str = "1 day",
    slide: str | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "topic",
) -> DataFrame:
    """Tumbling (slide=None) or sliding window counts per key, tolerating
    out-of-order arrivals up to `watermark`; rows later than that are
    dropped (exactly the documented late-data contract)."""
    win = (
        F.window(ts_col, window)
        if slide is None
        else F.window(ts_col, window, slide)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n",
        )
    )


def session_windows(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming sessionization via session_window — the stateful twin of
    the batch lag+cumsum plan (plans/analytics.py events_sessionize)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def interval_join(
    left,
    right,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
):
    """Watermarked stream-stream interval join: pair each left event with
    right events of the same key that happened within (left_ts - max_gap,
    left_ts].  Both sides buffer state only inside the watermark horizon —
    the join Spark can run continuously where a batch engine would
    re-scan; the reference has no joins beyond its static view
    (SURVEY.md §2 C).

    ``how='leftOuter'`` additionally emits unmatched left rows
    (right columns null) — but only once the watermark has passed the
    row's join window, because until then a match could still arrive;
    late-emission-on-expiry is the semantic a funnel "purchases without
    a prior click" readout needs continuously.
    """
    from pyspark.sql import functions as F

    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[by] == rw[f"{by}_r"])
        & (rw[right_ts] <= lw[left_ts])
        & (rw[right_ts] >= lw[left_ts] - F.expr(f"INTERVAL {max_gap}"))
    )
    return lw.join(rw, cond, how)


def dedup_within_watermark(
    stream: DataFrame,
    keys: tuple[str, ...] = ("topic", "event_id"),
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming deduplication bounded by the watermark horizon
    (`dropDuplicatesWithinWatermark`): replayed deliveries of the same
    message — the at-least-once duplicates our checkpointed MQTT source
    can produce on recovery (sources/mqtt.py WAL replay; the reference
    is QoS-0 at-most-once and never sees duplicates,
    /root/reference/mqtt2sql.py:757,760) — are suppressed when they
    arrive within `watermark` of the first delivery.

    State is keyed by `keys` and expires with the watermark, so memory
    is bounded by (duplicate-window arrival rate × horizon), not by
    stream history — the property that makes this safe at 100 TB where
    an unbounded `dropDuplicates` would accumulate state forever.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def throttle_stream(
    stream: DataFrame,
    keys: tuple[str, ...] = ("topic",),
    ts_col: str = "ts",
    bucket_seconds: int = 300,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming throttle/debounce: emit only the first event per
    (`keys`, tumbling `bucket_seconds` bucket) — the rate-limit /
    alert-dedup operator; the batch twin is
    plans/analytics.throttle_events_5min (first-in-bucket by the total
    order, which in-order streams reproduce as first-arrival).

    Built on `dropDuplicatesWithinWatermark` keyed by (keys, bucket):
    per-key state is one row per active bucket and expires with the
    watermark, so memory is bounded by key cardinality × the horizon /
    bucket ratio — never by stream history.  Keep `watermark` ≥ the
    bucket length or a straggler can re-open an expired bucket.
    """
    us = bucket_seconds * 1_000_000
    bucketed = stream.withColumn(
        "_bkt", F.expr(f"unix_micros({ts_col}) DIV {us}")
    )
    return (
        bucketed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark([*keys, "_bkt"])
        .drop("_bkt")
    )
