"""Watermarked windowed aggregation over event streams.

The Structured-Streaming-native half of §2.10 next to nrt.py's custom
stateful operators: tumbling/sliding event-time windows with a watermark
bounding both state size and late-data admission.  Late events inside the
watermark are still folded into their (already-open) window; events later
than the watermark are DROPPED — at 100 TB/day this bound is what keeps the
window state store finite, so the watermark is a first-class argument, not
a tuning afterthought.

The same plan runs in batch mode (window() over a static frame) — that
batch twin is the driver oracle (driver_queries.events_hourly_window uses
the identical expression shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-window (optionally per-key) event counts + distinct-user approx.

    Streaming input: withWatermark bounds state; append output emits a
    window exactly once, when the watermark passes its end.  Batch input:
    the SAME function works unchanged (watermark is a no-op in batch), so
    correctness is testable as a streaming-vs-batch twin.
    """
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(
        F.col(ts_col), window
    )
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(w.alias("win"), *[F.col(c) for c in key_cols])
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *key_cols,
            "n_events",
            "approx_users",
        )
    )
