"""NRT indexing test: Structured Streaming foreachBatch appends segments,
readers see new snapshots via the manifest (soft-commit semantics)."""

from __future__ import annotations

import os
import time

import pytest

from lucene_solr_intervals_spark.index.segment import read_manifest, verify_index
from lucene_solr_intervals_spark.search.wand import search_segments
from lucene_solr_intervals_spark.streaming.nrt import append_segment_batch, delete_by_doc_ids


def test_foreachbatch_appends_segments(spark, tmp_path):
    index_dir = str(tmp_path / "nrt_idx")
    os.makedirs(index_dir)
    in_dir = str(tmp_path / "incoming")
    os.makedirs(in_dir)
    ckpt = str(tmp_path / "ckpt")

    # batch 0 lands before the stream starts
    spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha alpha delta")], ["doc_id", "text"]
    ).write.json(f"{in_dir}/b0")

    schema = "doc_id LONG, text STRING"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .json(f"{in_dir}/*")
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda df, epoch: append_segment_batch(df, index_dir)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    m1 = read_manifest(index_dir)
    assert m1["n_docs"] == 2
    hits = search_segments(spark, index_dir, ["alpha"], k=10).collect()
    assert {r["doc_id"] for r in hits} == {0, 1}
    # tf=2 ranks doc 1 first
    assert hits[0]["doc_id"] == 1

    # micro-batch 2 -> new segment, reader reopens via manifest
    spark.createDataFrame(
        [(2, "alpha omega"), (3, "omega omega")], ["doc_id", "text"]
    ).write.json(f"{in_dir}/b1")
    q2 = (
        spark.readStream.schema(schema)
        .json(f"{in_dir}/*")
        .writeStream.foreachBatch(lambda df, epoch: append_segment_batch(df, index_dir))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)

    m2 = read_manifest(index_dir)
    assert m2["n_docs"] == 4
    assert len([s for s in m2["segments"] if s["status"] == "done"]) >= 2
    hits2 = search_segments(spark, index_dir, ["alpha"], k=10).collect()
    assert {r["doc_id"] for r in hits2} == {0, 1, 2}
    res = verify_index(spark, index_dir)
    assert res["ok"], res["problems"]


def test_tombstones(spark, tmp_path):
    index_dir = str(tmp_path / "tomb_idx")
    os.makedirs(index_dir)
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha gamma")], ["doc_id", "text"]
    )
    append_segment_batch(df, index_dir)
    m = delete_by_doc_ids(index_dir, [0])
    assert m["tombstones"] == [0]


def test_stateful_sessionization_across_batches(spark, tmp_path):
    """applyInPandasWithState sessionization: two time-split micro-batches
    (state must carry last_ts across the batch boundary) produce the same
    per-user session counts as the batch lag-window twin."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucene_solr_intervals_spark.streaming.nrt import sessionize_stateful

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts", "event_id"
    )
    # batch oracle: 30-min-gap sessionization via lag window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")
    g = events.withColumn(
        "new_session",
        F.when(epoch - F.lag(epoch).over(w) > 1800, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    expect = {
        r["user_id"]: r["n"]
        for r in g.groupBy("user_id").agg(F.sum("new_session").alias("n")).collect()
    }

    # two time-split files -> two micro-batches (maxFilesPerTrigger=1), so
    # sessions spanning the boundary exercise the carried state
    med = events.selectExpr(
        "percentile(cast(cast(ts as timestamp) as long), 0.5) AS m"
    ).head()["m"]
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    ep = F.col("ts").cast("timestamp").cast("long")
    events.where(ep <= med).coalesce(1).write.parquet(f"{src}/p=0")
    events.where(ep > med).coalesce(1).write.parquet(f"{src}/p=1")

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/p=*")
    )
    out_dir = str(tmp_path / "stream_out")
    chk = str(tmp_path / "chk")
    q = (
        sessionize_stateful(stream, gap_sec=1800)
        .writeStream.foreachBatch(
            lambda df, _eid: df.write.mode("append").parquet(out_dir)
        )
        .option("checkpointLocation", chk)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    res = spark.read.parquet(out_dir)
    # latest emission per user = final running total
    wl = Window.partitionBy("user_id").orderBy(F.desc("last_ts"))
    final = (
        res.withColumn("rn", F.row_number().over(wl))
        .where(F.col("rn") == 1)
        .select("user_id", "n_sessions")
        .collect()
    )
    got = {r["user_id"]: r["n_sessions"] for r in final}
    assert got == expect


def test_update_documents_atomic(spark, tmp_path):
    """updateDocument analog: new segment + tombstones on the old ids land
    in one manifest commit; search sees the new version only."""
    from lucene_solr_intervals_spark.index.segment import build_segments, read_manifest
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher
    from lucene_solr_intervals_spark.streaming.nrt import update_documents

    index_dir = str(tmp_path / "idx")
    corpus = spark.createDataFrame(
        [(0, "old version marker_a"), (1, "other doc"), (2, "third doc")],
        ["doc_id", "text"],
    )
    build_segments(corpus, index_dir, n_segments=1, id_col="doc_id",
                   text_col="text", n_docs_hint=3)
    new_rows = spark.createDataFrame(
        [(3, "new version marker_b")], ["doc_id", "text"]
    )
    update_documents(new_rows, index_dir, old_doc_ids=[0])
    m = read_manifest(index_dir)
    assert 0 in m["tombstones"]
    ss = SegmentSearcher(spark, index_dir)
    got_a = [r["doc_id"] for r in ss.search(["marker_a"], k=5).collect()]
    got_b = [r["doc_id"] for r in ss.search(["marker_b"], k=5).collect()]
    assert got_a == []      # old version tombstoned
    assert got_b == [3]     # new version visible


def test_realtime_get(spark, tmp_path):
    """RealTimeGetComponent analog: point lookup sees each committed NRT
    batch immediately, honors tombstones and updates."""
    from lucene_solr_intervals_spark.streaming.nrt import (
        realtime_get,
        update_documents,
    )

    index_dir = str(tmp_path / "rtg_idx")
    os.makedirs(index_dir)
    b0 = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], ["doc_id", "text"]
    )
    append_segment_batch(b0, index_dir)

    got = {r["doc_id"]: r for r in realtime_get(spark, index_dir, [0, 1, 99]).collect()}
    assert set(got) == {0, 1}
    assert got[0]["doclen"] == 2

    # a new micro-batch is visible the moment its manifest entry commits
    b1 = spark.createDataFrame([(2, "omega")], ["doc_id", "text"])
    append_segment_batch(b1, index_dir)
    got = {r["doc_id"] for r in realtime_get(spark, index_dir, [2]).collect()}
    assert got == {2}

    # deletes hide the id
    delete_by_doc_ids(index_dir, [1])
    assert realtime_get(spark, index_dir, [1]).collect() == []

    # update: old identity gone, new identity (fresh global id) visible
    newv = spark.createDataFrame([(3, "alpha prime")], ["doc_id", "text"])
    update_documents(newv, index_dir, old_doc_ids=[0])
    ids = {r["doc_id"] for r in realtime_get(spark, index_dir, [0, 3]).collect()}
    assert ids == {3}

    # stored-field join-back
    corpus = b0.unionByName(b1).unionByName(newv)
    row = realtime_get(spark, index_dir, [3], corpus=corpus).collect()[0]
    assert row["text"] == "alpha prime"
