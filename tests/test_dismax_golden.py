"""TestDisjunctionMaxQuery transcription (lucene/core/src/test/org/apache/
lucene/search/TestDisjunctionMaxQuery.java): the albino-elephant corpus
(:98-165) under the suite's TestSimilarity (:67-86 — tf>0 -> 1, idf = 1,
no length norm, so every term hit scores exactly 1.0) — pins the dismax
combiner max + tie * (sum - max) and its interaction with Boolean MUST /
SHOULD."""

from __future__ import annotations

from dataclasses import dataclass

import pytest
from pyspark.sql import functions as F

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.scoring.similarities import SimilarityBase
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher


@dataclass(frozen=True)
class _ConstSim(SimilarityBase):
    """The suite's TestSimilarity: every matching term scores 1.0."""

    name: str = "const_one"

    def score_col(self, tf, df, ttf, doclen, *, n_docs, avgdl, sum_ttf):
        return F.when(tf > 0, F.lit(1.0)).otherwise(F.lit(0.0))


# doc_id 0..3 = d1..d4; d3 has NO dek field value
ROWS = [
    (0, "elephant", "elephant"),
    (1, "elephant", "albino elephant"),
    (2, "albino elephant", ""),
    (3, "albino elephant", "albino"),
]


@pytest.fixture(scope="module")
def searcher(spark):
    corpus = spark.createDataFrame(ROWS, ["doc_id", "hed", "dek"])
    idx = build_index(corpus, analyzer="ws", fields={"hed": "hed", "dek": "dek"})
    s = Searcher(idx, corpus=corpus, mode="sql", similarity=_ConstSim())
    yield s
    idx.unpersist()


def _hits(searcher, q):
    return {
        r["doc_id"]: round(r["score"], 6) for r in searcher.scored(q).collect()
    }


def _dismax(tie, *terms):
    return Q.DisjunctionMax(
        tuple(Q.Term(t, field=f) for f, t in terms), tie_breaker=tie
    )


def test_simple_equal_scores1(searcher):
    """:206-228 — dismax(0) over hed:albino, hed:elephant: 4 equal hits."""
    h = _hits(searcher, _dismax(0.0, ("hed", "albino"), ("hed", "elephant")))
    assert set(h) == {0, 1, 2, 3}
    assert len(set(h.values())) == 1


def test_simple_equal_scores2_and_3(searcher):
    """:230-276 — dek-only: 3 equal hits; all four clauses: 4 equal hits."""
    h = _hits(searcher, _dismax(0.0, ("dek", "albino"), ("dek", "elephant")))
    assert set(h) == {0, 1, 3}
    assert len(set(h.values())) == 1
    h = _hits(
        searcher,
        _dismax(
            0.0,
            ("hed", "albino"), ("hed", "elephant"),
            ("dek", "albino"), ("dek", "elephant"),
        ),
    )
    assert set(h) == {0, 1, 2, 3}
    assert len(set(h.values())) == 1


def test_simple_tiebreaker(searcher):
    """:278-301 — dismax(0.01) over dek terms: d2 (both terms) wins, the
    other two tie below it."""
    h = _hits(searcher, _dismax(0.01, ("dek", "albino"), ("dek", "elephant")))
    assert set(h) == {0, 1, 3}
    assert h[1] > h[0] and h[0] == h[3]
    assert h[1] == pytest.approx(1.01)


def test_boolean_required_equal_scores(searcher):
    """:303-337 — MUST(dismax(albino), dismax(elephant)): 3 equal hits."""
    q = Q.Boolean(
        must=(
            _dismax(0.0, ("hed", "albino"), ("dek", "albino")),
            _dismax(0.0, ("hed", "elephant"), ("dek", "elephant")),
        )
    )
    h = _hits(searcher, q)
    assert set(h) == {1, 2, 3}
    assert len(set(h.values())) == 1


def test_boolean_optional_no_tiebreaker(searcher):
    """:339-373 — SHOULD of the two dismaxes: 4 hits, d1 strictly last."""
    q = Q.Boolean(
        should=(
            _dismax(0.0, ("hed", "albino"), ("dek", "albino")),
            _dismax(0.0, ("hed", "elephant"), ("dek", "elephant")),
        )
    )
    h = _hits(searcher, q)
    assert set(h) == {0, 1, 2, 3}
    top = {h[1], h[2], h[3]}
    assert len(top) == 1
    assert h[0] < h[1]


def test_boolean_optional_with_tiebreaker(searcher):
    """:375-428 — tie 0.01: {d2, d4} tie first, then d3, then d1."""
    q = Q.Boolean(
        should=(
            _dismax(0.01, ("hed", "albino"), ("dek", "albino")),
            _dismax(0.01, ("hed", "elephant"), ("dek", "elephant")),
        )
    )
    h = _hits(searcher, q)
    assert set(h) == {0, 1, 2, 3}
    assert h[1] == h[3]                 # d2 == d4
    assert h[1] > h[2] > h[0]           # > d3 > d1
    assert h[1] == pytest.approx(2.01)
    assert h[2] == pytest.approx(2.0)
    assert h[0] == pytest.approx(1.01)
