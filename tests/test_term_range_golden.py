"""TestTermRangeQuery transcription (lucene/core/src/test/org/apache/
lucene/search/TestTermRangeQuery.java): exclusive/inclusive bounds,
incremental adds, and the null-bound open-range semantics of testAllDocs
(:54-124).  The empty-string-term cases (:270-336) need an analyzer that
emits "" tokens, which the reference itself calls out as a quirk of its
test analyzer — not transcribed."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher


def _searcher(spark, terms):
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(terms)], ["doc_id", "text"]
    )
    idx = build_index(corpus, analyzer="keyword")
    return idx, Searcher(idx, corpus=corpus, mode="sql")


def _n(s, lo, hi, inc_lo, inc_hi):
    return s.matching(
        Q.TermRange(lo, hi, include_lower=inc_lo, include_upper=inc_hi)
    ).count()


def test_exclusive(spark):
    """testExclusive (:54-76): {A TO C} over growing doc sets."""
    for terms, expected in [
        (["A", "B", "C", "D"], 1),      # only B
        (["A", "B", "D"], 1),           # only B
        (["A", "B", "D", "C"], 1),      # C added, still only B
    ]:
        idx, s = _searcher(spark, terms)
        try:
            assert _n(s, "A", "C", False, False) == expected, terms
        finally:
            idx.unpersist()


def test_inclusive(spark):
    """testInclusive (:78-100): [A TO C]."""
    for terms, expected in [
        (["A", "B", "C", "D"], 3),
        (["A", "B", "D"], 2),
        (["A", "B", "D", "C"], 3),
    ]:
        idx, s = _searcher(spark, terms)
        try:
            assert _n(s, "A", "C", True, True) == expected, terms
        finally:
            idx.unpersist()


def test_all_docs_null_bounds(spark):
    """testAllDocs (:104-124): null bounds are OPEN ends — [null TO null]
    matches everything regardless of inclusive flags; ["" TO null] too;
    [B TO null] matches the upper tail."""
    idx, s = _searcher(spark, ["A", "B", "C", "D"])
    try:
        assert _n(s, None, None, True, True) == 4
        assert _n(s, None, None, False, False) == 4
        assert _n(s, "", None, True, False) == 4
        assert _n(s, "B", None, True, False) == 3
    finally:
        idx.unpersist()
