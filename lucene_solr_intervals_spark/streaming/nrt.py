"""Near-real-time indexing: Structured Streaming micro-batch == soft commit.

The reference's streaming-shaped feature is NRT reopen — soft commits +
DirectoryReader.openIfChanged + ControlledRealTimeReopenThread (SURVEY.md
§2.10).  The idiomatic Spark equivalent: readStream over the arriving
corpus -> foreachBatch appending one new segment per micro-batch + an
atomic manifest commit; readers re-read the manifest to see the new
snapshot (openIfChanged == re-resolve the live segment set).

Deletes/updates follow the reference's delete-by-term model: a tombstone
list in the manifest, applied as an anti-join at query time and dropped
physically at the next merge (liveDocs bitset + merge-time reclaim).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.segment import (
    NORMS_SCHEMA,
    POSTINGS_SCHEMA,
    _invert_segment,
    _norms_blob,
    _sidecar_from_docs,
    _tokenize_for_segments,
    _write_manifest,
    read_manifest,
)


def append_segment_batch(
    batch_df: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "code",
) -> dict | None:
    """foreachBatch sink: one micro-batch -> one new immutable segment.

    Usage:
        stream.writeStream.foreachBatch(
            lambda df, epoch: append_segment_batch(df, index_dir)
        ).start()
    """
    if batch_df.isEmpty():
        return None
    manifest = (
        read_manifest(index_dir)
        if os.path.exists(os.path.join(index_dir, "manifest.json"))
        else {"version": 1, "n_docs": 0, "sum_doclen": 0, "analyzer": analyzer,
              "segments": [], "metrics": {}}
    )
    new_seg = 1 + max((s["seg"] for s in manifest["segments"]), default=-1)

    tok = _tokenize_for_segments(analyzer)
    tokenized = (
        batch_df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.sha2(F.col(text_col).cast("binary"), 256).alias("sha256"),
            tok(F.col(text_col)).alias("t"),
        )
        .select("doc_id", "sha256", "t.terms", "t.positions", "t.doclen", "t.norm_byte")
        .withColumn("seg", F.lit(new_seg).cast("int"))
    )
    # n_tok = raw emitted-token count (overlaps included; sumTotalTermFreq)
    docs_df = tokenized.select(
        "seg", "doc_id", "doclen",
        F.size("terms").cast("long").alias("n_tok"),
        "norm_byte", "sha256",
    )
    docs_df.write.mode("append").partitionBy("seg").parquet(os.path.join(index_dir, "docs"))
    # appended segments encode with the index's declared codec
    codec_name = manifest.get("codec", "varbyte")

    def _invert(pdf):
        from ..codecs.registry import get_codec

        return _invert_segment(pdf, codec=get_codec(codec_name))

    postings = tokenized.groupBy("seg").applyInPandas(_invert, POSTINGS_SCHEMA)
    postings.write.mode("append").partitionBy("seg").parquet(
        os.path.join(index_dir, "postings")
    )
    norms = (
        docs_df.select("seg", "doc_id", "norm_byte")
        .groupBy("seg")
        .applyInPandas(lambda p: _norms_blob(p), NORMS_SCHEMA)
    )
    norms.write.mode("append").partitionBy("seg").parquet(os.path.join(index_dir, "norms"))
    # sidecar row so docs/norms stay derivable from postings alone
    (
        docs_df.groupBy("seg")
        .applyInPandas(_sidecar_from_docs, POSTINGS_SCHEMA)
        .write.mode("append")
        .partitionBy("seg")
        .parquet(os.path.join(index_dir, "postings"))
    )

    stats = docs_df.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("doc_id").alias("base"),
        F.sum("doclen").alias("s"),
        F.sum("n_tok").alias("t"),
    ).collect()
    if not stats:
        return manifest
    r = stats[0]
    manifest["segments"].append(
        {
            "seg": new_seg,
            "doc_base": int(r["base"]),
            "n_docs": int(r["n"]),
            "sum_doclen": int(r["s"]),
            "sum_ttf": int(r["t"]),
            "status": "done",
            "lineage": [],
            "built_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
    )
    live = [s for s in manifest["segments"] if s["status"] == "done"]
    manifest["n_docs"] = sum(s["n_docs"] for s in live)
    manifest["sum_doclen"] = sum(s["sum_doclen"] for s in live)
    manifest["sum_ttf"] = sum(s.get("sum_ttf", s["sum_doclen"]) for s in live)
    _write_manifest(index_dir, manifest)
    return manifest


def sessionize_stateful(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Custom STATEFUL streaming operator: gap-based sessionization via
    applyInPandasWithState (the arbitrary-stateful-processing API — the
    Spark-idiomatic home for operators the built-in windowed aggs can't
    express).  Per user, state carries (n_sessions, last_ts); each
    micro-batch folds its events in timestamp order and emits the updated
    running total (Update output mode, no timeout — session closure is
    decided by the next event's gap, so the count is exact whenever events
    arrive time-ordered per key across batches).

    Input: streaming DataFrame with (user_id long, ts timestamp, event_id
    long).  Output stream: (user_id, n_sessions, last_ts) — latest row per
    user is the current total.  Batch twin (identical semantics, one lag
    window): driver_queries.events_sessionize.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_sessions long, last_ts double"
    state_schema = "n_sessions long, last_ts double"

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            n_sessions, last_ts = state.get
        else:
            n_sessions, last_ts = 0, None
        parts = [p[["ts", "event_id"]] for p in pdfs]
        if parts:
            batch = pd.concat(parts, ignore_index=True)
            batch = batch.sort_values(["ts", "event_id"])
            for t in batch["ts"]:
                epoch = t.timestamp()
                if last_ts is None or epoch - last_ts > gap_sec:
                    n_sessions += 1
                last_ts = epoch
        state.update((n_sessions, last_ts if last_ts is not None else -1.0))
        yield pd.DataFrame(
            [{"user_id": user_id, "n_sessions": n_sessions, "last_ts": last_ts}]
        )

    return (
        events.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
        )
    )


def delete_by_doc_ids(
    index_dir: str, doc_ids: list[int], spill_threshold: int | None = None
) -> dict:
    """Delete-by-term analog: tombstones (liveDocs bitset role) applied as
    an anti-join by readers and reclaimed at merge.  Small sets live in the
    manifest; past `spill_threshold` (default
    segment.TOMBSTONE_SPILL_THRESHOLD) the full set moves to a parquet side
    table so the manifest — and every reader's memory — stays O(1) in the
    number of deletes (readers then receive per-segment slices through the
    norms cogroup, never the whole set)."""
    from ..index.segment import (
        TOMBSTONE_SPILL_THRESHOLD,
        read_spilled_tombstones,
        spill_tombstones,
    )

    if spill_threshold is None:
        spill_threshold = TOMBSTONE_SPILL_THRESHOLD
    manifest = read_manifest(index_dir)
    tomb = set(manifest.get("tombstones", []))
    if manifest.get("tombstones_spilled"):
        tomb |= read_spilled_tombstones(index_dir)
    tomb.update(int(d) for d in doc_ids)
    if manifest.get("tombstones_spilled") or len(tomb) > spill_threshold:
        spill_tombstones(index_dir, manifest, tomb)
    else:
        manifest["tombstones"] = sorted(tomb)
    _write_manifest(index_dir, manifest)
    return manifest


def realtime_get(
    spark,
    index_dir: str,
    doc_ids: list[int],
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """RealTimeGetComponent analog (solr/core/.../component/
    RealTimeGetComponent.java:69): get-by-id against the LATEST committed
    manifest snapshot — sees every NRT micro-batch segment the moment its
    manifest entry reaches status="done", and honors tombstones (a deleted
    or superseded id returns nothing; after update_documents only the NEW
    identity is returned).

    Solr's uncommitted-read semantics (serving from the in-memory update
    log BEFORE a commit) has no analog here by design: the NRT path
    commits per micro-batch, so the manifest snapshot IS the realtime
    view.  Plan shape: the manifest read is O(1) driver-side; the docs
    scan is partition-pruned to live segments and id-pushdown filtered;
    `corpus` (optional) broadcast-joins the stored text back on.
    """
    import os as _os

    from pyspark.sql import functions as F

    from ..index.segment import read_spilled_tombstones

    manifest = read_manifest(index_dir)
    live = [
        int(s["seg"]) for s in manifest["segments"] if s.get("status") == "done"
    ]
    tomb = set(int(t) for t in manifest.get("tombstones", []))
    if manifest.get("tombstones_spilled"):
        tomb |= read_spilled_tombstones(index_dir)
    want = [int(d) for d in doc_ids if int(d) not in tomb]
    docs = spark.read.parquet(_os.path.join(index_dir, "docs"))
    out = docs.where(F.col("seg").isin(live) & F.col("doc_id").isin(want)).select(
        "doc_id", "seg", "doclen", "norm_byte", "sha256"
    )
    if corpus is not None:
        stored = corpus.where(F.col(id_col).isin(want)).withColumnRenamed(
            id_col, "doc_id"
        )
        out = out.join(F.broadcast(stored), "doc_id", "left")
    return out


def update_documents(
    batch_df: DataFrame,
    index_dir: str,
    old_doc_ids: list[int],
    new_id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: str = "code",
) -> dict | None:
    """IndexWriter.updateDocument analog (delete + add as one visible
    change): the new versions land as a fresh segment, the superseded doc
    ids become tombstones, and BOTH edits commit in one atomic manifest
    replace — a reader re-reading the manifest sees either the old state or
    (new segment + tombstones), never a half-update.

    The new rows must carry fresh GLOBAL doc ids (ids are immutable and
    contiguous per segment; an update is a new identity plus a tombstone on
    the old one — exactly Lucene's delete-then-add docID behavior)."""
    manifest = append_segment_batch(
        batch_df, index_dir, id_col=new_id_col, text_col=text_col, analyzer=analyzer
    )
    if manifest is None:
        return None
    tomb = set(manifest.get("tombstones", []))
    tomb.update(int(d) for d in old_doc_ids)
    manifest["tombstones"] = sorted(tomb)
    _write_manifest(index_dir, manifest)
    return manifest
