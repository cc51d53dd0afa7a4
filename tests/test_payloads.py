"""PAYLOADS posting feature (Weight.PostingFeatures.PAYLOADS,
Weight.java:217-235) + PayloadTermQuery scoring (PayloadTermQuery.java:55)."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher


def test_delimited_payload_filter(spark):
    """DelimitedPayloadTokenFilter.java:33: 'term|payload' tokens split into
    term + per-position float payload, aligned with positions."""
    corpus = spark.createDataFrame(
        [(0, "cat|2.0 dog|0.5 cat|4.0"), (1, "dog|1.5 bird")],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="ws", payload="delimited")
    rows = {
        (r["term"], r["doc_id"]): (list(r["positions"]), list(r["payloads"]))
        for r in idx.postings.collect()
    }
    assert rows[("cat", 0)] == ([0, 2], [2.0, 4.0])
    assert rows[("dog", 0)] == ([1], [0.5])
    assert rows[("dog", 1)] == ([0], [1.5])
    assert rows[("bird", 1)] == ([1], [1.0])  # missing payload -> default 1.0
    # term dictionary sees the SPLIT terms
    terms = {r["term"] for r in idx.term_stats.collect()}
    assert terms == {"cat", "dog", "bird"}
    idx.unpersist()


def test_payload_term_query_functions(spark):
    corpus = spark.createDataFrame(
        [(0, "cat|2.0 dog cat|4.0"), (1, "cat|10.0 fish"), (2, "dog only")],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="ws", payload="delimited")
    s = Searcher(idx, mode="sql")
    base = {r["doc_id"]: r["score"] for r in s.scored(Q.Term("cat")).collect()}

    got_avg = {r["doc_id"]: r["score"] for r in s.scored(Q.PayloadTerm("cat", fn="avg")).collect()}
    got_min = {r["doc_id"]: r["score"] for r in s.scored(Q.PayloadTerm("cat", fn="min")).collect()}
    got_max = {r["doc_id"]: r["score"] for r in s.scored(Q.PayloadTerm("cat", fn="max")).collect()}
    got_sum = {r["doc_id"]: r["score"] for r in s.scored(Q.PayloadTerm("cat", fn="sum")).collect()}
    assert set(got_avg) == {0, 1}
    assert got_avg[0] == pytest.approx(base[0] * 3.0, rel=1e-9)   # (2+4)/2
    assert got_min[0] == pytest.approx(base[0] * 2.0, rel=1e-9)
    assert got_max[0] == pytest.approx(base[0] * 4.0, rel=1e-9)
    assert got_sum[0] == pytest.approx(base[0] * 6.0, rel=1e-9)
    assert got_avg[1] == pytest.approx(base[1] * 10.0, rel=1e-9)

    # include_span_score=False: pure payload score (PayloadTermQuery.java:55)
    pure = {
        r["doc_id"]: r["score"]
        for r in s.scored(
            Q.PayloadTerm("cat", fn="max", include_span_score=False)
        ).collect()
    }
    assert pure[0] == pytest.approx(4.0) and pure[1] == pytest.approx(10.0)
    idx.unpersist()


def test_pos_mod7_payload_family(spark):
    """The SQL-replicable payload family used by the driver oracle."""
    corpus = spark.createDataFrame([(0, " ".join(["t"] * 10))], ["doc_id", "text"])
    idx = build_index(corpus, analyzer="ws", payload="pos_mod7")
    r = idx.postings.collect()[0]
    assert list(r["payloads"]) == [(p % 7) + 1.0 for p in range(10)]
    idx.unpersist()
