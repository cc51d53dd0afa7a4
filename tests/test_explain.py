"""explain() cross-verification (the CheckHits.java:35 invariant): for every
matching doc, explain(q, doc)['value'] must equal the scored() value."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown dog sleeps",
    "a fast brown fox leaps over fences and walls all day long every day",
    "quick quick quick fox",
    "lazy dogs and lazy cats sleep through the quick afternoon",
    "fox",
]

QUERIES = [
    Q.Term("fox"),
    Q.Term("quick", boost=2.0),
    Q.Boolean(must=(Q.Term("quick"), Q.Term("fox"))),
    Q.Boolean(should=(Q.Term("fox"), Q.Term("lazy")), min_should_match=1),
    Q.Boolean(must=(Q.Term("brown"),), must_not=(Q.Term("lazy"),)),
    Q.DisjunctionMax((Q.Term("fox"), Q.Term("lazy")), tie_breaker=0.3),
    Q.ConstantScore(Q.Term("fox"), boost=1.5),
    Q.Phrase(("quick", "brown")),
    Q.OrderedNear(3, (Q.Term("quick"), Q.Term("fox"))),
]


@pytest.fixture(scope="module", params=["sql", "lucene"])
def searcher(spark, request):
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )
    idx = build_index(corpus, analyzer="code")
    yield Searcher(idx, corpus=corpus, mode=request.param)
    idx.unpersist()


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_explain_matches_score(searcher, qi):
    q = QUERIES[qi]
    scored = {r["doc_id"]: r["score"] for r in searcher.scored(q).collect()}
    assert scored, f"query {q} matched nothing"
    for doc_id, score in scored.items():
        e = searcher.explain(q, doc_id)
        assert e["match"], (q, doc_id)
        assert e["value"] == pytest.approx(score, rel=1e-6), (q, doc_id)
    # a non-matching doc explains as no-match with value 0
    non_match = next(d for d in range(len(CORPUS)) if d not in scored)
    e = searcher.explain(q, non_match)
    assert not e["match"]
    assert e["value"] == 0.0


def test_format_explain(searcher):
    e = searcher.explain(Q.Boolean(must=(Q.Term("quick"), Q.Term("fox"))), 0)
    txt = Searcher.format_explain(e)
    assert "sum of:" in txt
    assert "weight(text:quick in 0)" in txt
    assert "idf(" in txt
