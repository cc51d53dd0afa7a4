"""TestWildcard transcription (lucene/core/src/test/org/apache/lucene/
search/TestWildcard.java): asterisk/questionmark semantics, case
sensitivity (multi-term queries never analyze their pattern), escaped
wildcards, and the no-wildcard / trailing-*-only rewrite equivalences."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher


def _searcher(spark, terms):
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(terms)], ["doc_id", "text"]
    )
    idx = build_index(corpus, analyzer="keyword")  # verbatim single term
    return idx, Searcher(idx, corpus=corpus, mode="sql")


def _n(searcher, q):
    return searcher.matching(q).count()


def test_asterisk(spark):
    """testAsterisk (:149-185)."""
    idx, s = _searcher(spark, ["metal", "metals"])
    try:
        assert _n(s, Q.Term("metal")) == 1
        assert _n(s, Q.Wildcard("metal*")) == 2
        assert _n(s, Q.Wildcard("m*tal")) == 1
        assert _n(s, Q.Wildcard("m*tal*")) == 2
        assert _n(s, Q.Wildcard("m*tals")) == 1
        assert _n(s, Q.Boolean(should=(Q.Wildcard("m*tals"),))) == 1
        assert (
            _n(s, Q.Boolean(should=(Q.Wildcard("m*tal"), Q.Wildcard("m*tals")))) == 2
        )
        # multi-term queries do NOT lower-case their pattern (:180-181)
        assert _n(s, Q.Wildcard("M*tal*")) == 0
        assert _n(s, Q.Wildcard("*tall")) == 0
        assert _n(s, Q.Wildcard("*tal")) == 1
        assert _n(s, Q.Wildcard("*tal*")) == 2
    finally:
        idx.unpersist()


def test_questionmark(spark):
    """testQuestionmark (:191-215)."""
    idx, s = _searcher(spark, ["metal", "metals", "mXtals", "mXtXls"])
    try:
        assert _n(s, Q.Wildcard("m?tal")) == 1
        assert _n(s, Q.Wildcard("metal?")) == 1
        assert _n(s, Q.Wildcard("metals?")) == 0
        assert _n(s, Q.Wildcard("m?t?ls")) == 3
        assert _n(s, Q.Wildcard("M?t?ls")) == 0
        # 'meta??' matches 'metals' not 'metal' (:212)
        assert _n(s, Q.Wildcard("meta??")) == 1
    finally:
        idx.unpersist()


def test_escapes(spark):
    """testEscapes (:217-249): backslash makes the next wildcard literal;
    a trailing backslash is leniently literal."""
    idx, s = _searcher(
        spark, ["foo*bar", "foo??bar", "fooCDbar", "fooSOMETHINGbar", "foo\\"]
    )
    try:
        assert _n(s, Q.Wildcard("foo*bar")) == 4
        assert _n(s, Q.Wildcard("foo\\*bar")) == 1
        assert _n(s, Q.Wildcard("foo??bar")) == 2
        assert _n(s, Q.Wildcard("foo\\?\\?bar")) == 1
        assert _n(s, Q.Wildcard("foo\\")) == 1
    finally:
        idx.unpersist()


def test_no_wildcard_and_prefix_equivalence(spark):
    """testTermWithoutWildcard / testPrefixTerm (:70-147): a pattern with
    no wildcard matches exactly like a TermQuery; a trailing-*-only
    pattern matches exactly like a PrefixQuery; empty pattern matches
    nothing (empty BooleanQuery rewrite)."""
    idx, s = _searcher(spark, ["nowildcard", "nowildcardx", "prefix", "prefixx"])
    try:
        assert _n(s, Q.Wildcard("nowildcard")) == 1
        got_w = {r["doc_id"] for r in s.matching(Q.Wildcard("prefix*")).collect()}
        got_p = {r["doc_id"] for r in s.matching(Q.Prefix("prefix")).collect()}
        assert got_w == got_p and len(got_w) == 2
        assert _n(s, Q.Wildcard("")) == 0
    finally:
        idx.unpersist()
