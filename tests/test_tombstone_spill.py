"""Scalable tombstones: past the spill threshold, the delete set leaves the
JSON manifest for a parquet side table, and readers receive PER-SEGMENT
slices through the norms cogroup — no corpus-sized set in the manifest, in
any closure, or on the driver."""

import json
import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spilled_index(spark, tmp_path_factory):
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import build_segments
    from lucene_solr_intervals_spark.streaming.nrt import delete_by_doc_ids

    d = str(tmp_path_factory.mktemp("spill") / "idx")
    corpus = generate_corpus(spark, 400).persist()
    corpus.count()
    build_segments(corpus, d, n_segments=4, id_col="doc_id",
                   text_col="content", n_docs_hint=400)
    # force the spill with a tiny threshold
    delete_by_doc_ids(d, list(range(0, 100)), spill_threshold=10)
    yield d, corpus
    corpus.unpersist()


def test_manifest_stays_small(spilled_index):
    d, _ = spilled_index
    m = json.load(open(os.path.join(d, "manifest.json")))
    assert m.get("tombstones_spilled") is True
    assert m.get("n_tombstones") == 100
    assert "tombstones" not in m  # the id list left the manifest
    assert os.path.exists(os.path.join(d, "tombstones", "tombstones.parquet"))


def test_search_excludes_spilled_deletes(spark, spilled_index):
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    d, _ = spilled_index
    ss = SegmentSearcher(spark, d)
    assert ss.tombstones == frozenset()  # nothing corpus-sized in the closure
    got = [r["doc_id"] for r in ss.search(["get_index"], k=50).collect()]
    assert got and all(g >= 100 for g in got)
    # batch path honors the per-seg slices too
    gm = [r["doc_id"] for r in ss.search_many(["get_index"], k=50).collect()]
    assert gm and all(g >= 100 for g in gm)


def test_interval_search_excludes_spilled(spark, spilled_index):
    from lucene_solr_intervals_spark.search import queries as Q
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    d, _ = spilled_index
    ss = SegmentSearcher(spark, d)
    got = [
        r["doc_id"]
        for r in ss.search_intervals(
            Q.OrderedNear(5, (Q.Term("get_index"), Q.Term("merge_posting"))), k=50
        ).collect()
    ]
    assert all(g >= 100 for g in got)


def test_incremental_delete_appends_to_spill(spark, spilled_index):
    from lucene_solr_intervals_spark.index.segment import read_spilled_tombstones
    from lucene_solr_intervals_spark.streaming.nrt import delete_by_doc_ids

    d, _ = spilled_index
    delete_by_doc_ids(d, [250, 251], spill_threshold=10)
    ids = read_spilled_tombstones(d)
    assert {250, 251} <= ids and len(ids) == 102


def test_merge_reclaims_spilled(spark, tmp_path):
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import (
        build_segments,
        merge_segments,
        read_manifest,
        read_spilled_tombstones,
    )
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher
    from lucene_solr_intervals_spark.streaming.nrt import delete_by_doc_ids

    d = str(tmp_path / "idx")
    corpus = generate_corpus(spark, 200)
    build_segments(corpus, d, n_segments=4, id_col="doc_id",
                   text_col="content", n_docs_hint=200)
    delete_by_doc_ids(d, list(range(0, 60)), spill_threshold=5)
    m = read_manifest(d)
    assert m["tombstones_spilled"]
    live = [s["seg"] for s in m["segments"] if s["status"] == "done"]
    merge_segments(spark, d, live[:2], new_seg=100)  # covers doc ids 0..99
    remaining = read_spilled_tombstones(d)
    assert remaining == set()  # every delete lived in the merged ranges
    ss = SegmentSearcher(spark, d)
    got = [r["doc_id"] for r in ss.search(["get_index"], k=50).collect()]
    assert all(g >= 60 for g in got)
