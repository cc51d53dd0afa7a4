"""Watermarked windowed aggregation: streaming-vs-batch twin + late-data
semantics (append mode emits a window once the watermark passes its end;
events later than the watermark are dropped)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucene_solr_intervals_spark.streaming.windowed import windowed_event_counts

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ]
)


def _ts(minute):
    return dt.datetime(2026, 1, 1, minute // 60, minute % 60)


def test_streaming_matches_batch_twin(spark, tmp_path):
    rows = [
        (1, _ts(5), 1),
        (1, _ts(25), 2),
        (2, _ts(40), 3),
        (2, _ts(65), 4),
        (3, _ts(70), 5),
        (1, _ts(130), 6),
    ]
    src = tmp_path / "events"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(src))

    batch = {
        (r["window_start"], r["n_events"])
        for r in windowed_event_counts(
            spark.read.schema(SCHEMA).parquet(str(src)), window="1 hour"
        ).collect()
    }
    assert batch == {(_ts(0), 3), (_ts(60), 2), (_ts(120), 1)}

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    agg = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_twin")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["n_events"])
        for r in spark.sql("SELECT * FROM win_twin").collect()
    }
    assert got == batch


def test_append_mode_watermark_drops_late_events(spark, tmp_path):
    """Two micro-batches: the second carries an event 2h older than the
    stream's max event time — beyond the 30-minute watermark, so it must
    NOT resurrect the already-finalized window."""
    src = tmp_path / "events_late"
    src.mkdir()
    sink = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    batch1 = [(1, _ts(5), 1), (1, _ts(10), 2), (2, _ts(200), 3)]
    spark.createDataFrame(batch1, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    agg = windowed_event_counts(stream, window="1 hour", watermark="30 minutes")

    def run_once():
        q = (
            agg.writeStream.format("parquet")
            .option("path", str(sink))
            .option("checkpointLocation", str(ckpt))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # batch 2: a late event for the hour-0 window (watermark is now at
    # ~200min - 30min, far past that window's end) plus a fresh event
    batch2 = [(9, _ts(15), 99), (2, _ts(260), 4)]
    spark.createDataFrame(batch2, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()
    # third pass with max event time pushed far forward so every remaining
    # window's end falls behind the watermark and gets emitted
    batch3 = [(2, _ts(1000), 5)]
    spark.createDataFrame(batch3, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    run_once()

    out = spark.read.parquet(str(sink))
    by_window = {
        r["window_start"]: r["n_events"] for r in out.collect()
    }
    # hour-0 window: the two on-time events only — the late event (user 9,
    # minute 15, arriving when the watermark had passed) is dropped
    assert by_window[_ts(0)] == 2
    assert by_window[_ts(180)] == 1  # minute-200 event's window
    assert _ts(240) in by_window  # minute-260 window emitted after batch 3


def test_sliding_window_and_keys(spark):
    rows = [(1, _ts(10), 1), (2, _ts(50), 2), (1, _ts(70), 3)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["window_start"], r["user_id"], r["n_events"])
        for r in windowed_event_counts(
            df, window="1 hour", slide="30 minutes", key_cols=("user_id",)
        ).collect()
    }
    # minute-10 event belongs to windows starting at -30 and 0
    assert (_ts(0), 1, 1) in got
    assert any(w == dt.datetime(2025, 12, 31, 23, 30) for (w, u, n) in got)
    # per-key split: user 2's minute-50 event never merges with user 1's
    assert (_ts(30), 2, 1) in got
