"""F4 golden scoring-order tests (TestIntervalScoring.java:47-84):
result ORDER parity for interval queries under BM25."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher

CORPUS = [
    "Should we, could we, would we?",  # 0
    "It should -  would it?",  # 1
    "It shouldn't",  # 2
    "Should we, should we, should we",  # 3
]


@pytest.fixture(scope="module")
def searcher(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    idx = build_index(df, analyzer="code")
    yield Searcher(idx, mode="lucene")
    idx.unpersist()


def test_ordered_near_scoring_order(searcher):
    # OrderedNear(10, should, would) -> docs [1, 0] (doc 1 is shorter)
    q = Q.OrderedNear(10, (Q.Term("should"), Q.Term("would")))
    got = [r["doc_id"] for r in searcher.search(q, k=10).collect()]
    assert got == [1, 0]


def test_empty_multiterm_near(searcher):
    # OrderedNear(10, /bar.*/, /foo.*/) -> 0 hits (empty expansions)
    q = Q.OrderedNear(10, (Q.Regexp("bar.*"), Q.Regexp("foo.*")))
    assert searcher.search(q, k=10).count() == 0


def test_rewritten_empty_boolean(searcher):
    # OR(empty-near, should) -> effectively TermQuery(should): order [3, 1, 0]
    q = Q.Boolean(
        should=(
            Q.OrderedNear(10, (Q.Regexp("bar.*"), Q.Regexp("foo.*"))),
            Q.Term("should"),
        )
    )
    got = [r["doc_id"] for r in searcher.search(q, k=10).collect()]
    assert got == [3, 1, 0]


def test_multiterm_expansion_inside_near(searcher):
    # OrderedNear(10, shou*, would) must expand the prefix and still match
    q = Q.OrderedNear(10, (Q.Prefix("shou"), Q.Term("would")))
    got = [r["doc_id"] for r in searcher.search(q, k=10).collect()]
    assert set(got) == {0, 1}
