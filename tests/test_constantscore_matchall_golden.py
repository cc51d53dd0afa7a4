"""TestConstantScoreQuery + TestMatchAllDocsQuery transcriptions
(lucene/core/src/test/org/apache/lucene/search/TestConstantScoreQuery.java
:79-126, TestMatchAllDocsQuery.java:46-88)."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher


@pytest.fixture(scope="module")
def csq_searcher(spark):
    corpus = spark.createDataFrame([(0, "term")], ["doc_id", "text"])
    idx = build_index(corpus, analyzer="keyword")
    s = Searcher(idx, corpus=corpus, mode="sql")
    yield s
    idx.unpersist()


def _scores(s, q):
    return {r["doc_id"]: round(r["score"], 6) for r in s.scored(q).collect()}


def test_constant_score_wrapped_two_times(csq_searcher):
    """testWrapped2Times (:79-126): a CSQ scores exactly its boost, a CSQ
    of a CSQ scores the OUTER boost, a SHOULD of the two sums, and a CSQ
    around that boolean flattens everything back to one constant."""
    csq1 = Q.ConstantScore(Q.Term("term"), boost=2.0)
    csq2 = Q.ConstantScore(csq1, boost=5.0)
    bq = Q.Boolean(should=(csq1, csq2))
    csqbq = Q.ConstantScore(bq, boost=17.0)

    assert _scores(csq_searcher, csq1) == {0: 2.0}
    assert _scores(csq_searcher, csq2) == {0: 5.0}
    assert _scores(csq_searcher, bq) == {0: 7.0}
    assert _scores(csq_searcher, csqbq) == {0: 17.0}


def test_constant_score_filter_composition(csq_searcher):
    """testConstantScoreQueryAndFilter (:129-156): CSQ(field:b) filtered by
    field:b hits; filtered by field:a misses."""
    s = csq_searcher
    hit = Q.Boolean(
        must=(Q.ConstantScore(Q.Term("term"), boost=3.0), Q.Term("term"))
    )
    miss = Q.Boolean(
        must=(Q.ConstantScore(Q.Term("term"), boost=3.0), Q.Term("absent"))
    )
    assert set(_scores(s, hit)) == {0}
    assert s.matching(miss).count() == 0


@pytest.fixture(scope="module")
def ma_searcher(spark):
    corpus = spark.createDataFrame(
        [(0, "one"), (1, "two"), (2, "three four")], ["doc_id", "text"]
    )
    idx = build_index(corpus, analyzer="code")
    s = Searcher(idx, corpus=corpus, mode="sql")
    yield s
    idx.unpersist()


def test_match_all_docs(ma_searcher):
    """testQuery (:46-88): MatchAll returns every doc in docID order (equal
    scores tie-break by id); MUST compositions behave like skipTo."""
    s = ma_searcher
    rows = s.search(Q.MatchAll(), k=10).collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2]
    assert len({round(r["score"], 6) for r in rows}) == 1

    both = Q.Boolean(must=(Q.MatchAll(), Q.MatchAll()))
    assert s.matching(both).count() == 3
    narrowed = Q.Boolean(must=(Q.MatchAll(), Q.Term("three")))
    assert [r["doc_id"] for r in s.matching(narrowed).collect()] == [2]
