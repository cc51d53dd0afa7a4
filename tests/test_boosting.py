"""BoostingQuery (lucene/queries/BoostingQuery.java:40): demote-not-exclude."""

import pytest

from lucene_solr_intervals_spark.search import queries as Q


def test_boosting_demotes_context_matches(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta"),
            (1, "alpha boilerplate"),
            (2, "alpha alpha"),
        ],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="code")
    s = Searcher(idx, corpus=corpus, mode="sql")
    base = {r["doc_id"]: r["score"] for r in s.scored(Q.Term("alpha")).collect()}
    q = Q.Boosting(Q.Term("alpha"), Q.Term("boilerplate"), context_boost=0.25)
    got = {r["doc_id"]: r["score"] for r in s.scored(q).collect()}
    # same matching set (context demotes, never excludes)
    assert set(got) == set(base)
    assert got[1] == pytest.approx(base[1] * 0.25)
    assert got[0] == pytest.approx(base[0])
    assert got[2] == pytest.approx(base[2])
    # matching() ignores the context entirely
    assert sorted(r["doc_id"] for r in s.matching(q).collect()) == [0, 1, 2]
    idx.unpersist()
