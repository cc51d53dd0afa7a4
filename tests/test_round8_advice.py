"""Regression tests for the round-7 ADVICE findings (fixed round 8).

1. edismax: AND connective arms the pending mode UNCONDITIONALLY, so
   chained 'a AND b AND c' and '+a AND b' require every operand —
   previously the right operand of AND stayed optional whenever the
   left was already MUST, changing matching under mm.
2. kmeans_centroids: non-numeric (string) vector ids no longer collapse
   to NULL under the long cast — they fall back to an xxhash64 spread
   key, so the stratified `% step` seed pick still returns k real rows.
"""

from __future__ import annotations

import pytest


def _parser():
    from lucene_solr_intervals_spark.search.edismax import EDisMaxParser

    return EDisMaxParser(qf={"text": 1.0})


def test_edismax_chained_and_requires_all():
    q = _parser().parse("alpha AND beta AND gamma")
    assert len(q.must) == 3 and len(q.should) == 0


def test_edismax_plus_then_and_requires_right():
    q = _parser().parse("+alpha AND beta")
    assert len(q.must) == 2 and len(q.should) == 0


def test_edismax_or_then_and():
    # classic-parser pending-connective semantics: AND binds beta+gamma
    q = _parser().parse("alpha OR beta AND gamma")
    assert len(q.must) == 2 and len(q.should) == 1


def test_edismax_and_matching_under_mm(spark):
    """With mm=100% the chained-AND bug changed MATCHING: gamma fell into
    should and mm demanded it anyway only by accident of clause counts.
    Pin the required-term set end-to-end via the query structure."""
    from lucene_solr_intervals_spark.search.edismax import EDisMaxParser

    p = EDisMaxParser(qf={"text": 1.0}, mm="2")
    q = p.parse("alpha AND beta AND gamma")
    # all three required -> mm applies to an EMPTY should list -> msm 0
    assert len(q.must) == 3 and q.min_should_match == 0


def test_kmeans_centroids_string_ids(spark):
    from lucene_solr_intervals_spark.ops.similarity import kmeans_centroids

    rows = [
        (f"doc-{i:04d}", [float(i % 7), float((i * 3) % 5), 1.0])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    cents = kmeans_centroids(df, n_centroids=4, iters=1)
    assert len(cents) == 4
    for _, v in cents:
        assert len(v) == 3
        assert abs(sum(x * x for x in v) - 1.0) < 1e-6
