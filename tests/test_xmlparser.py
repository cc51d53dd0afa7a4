"""XML query parser (CoreParser.java:67-117 element vocabulary)."""

import pytest

from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.xmlparser import parse_xml


def test_term_and_attrs():
    q = parse_xml('<TermQuery fieldName="title" boost="2.0">Hello</TermQuery>')
    assert q == Q.Term("hello", boost=2.0, field="title")


def test_terms_query_or():
    q = parse_xml("<TermsQuery>a b c</TermsQuery>")
    assert q == Q.Boolean(should=(Q.Term("a"), Q.Term("b"), Q.Term("c")))


def test_boolean_clauses():
    q = parse_xml(
        """
        <BooleanQuery minimumNumberShouldMatch="1">
          <Clause occurs="must"><TermQuery>a</TermQuery></Clause>
          <Clause occurs="should"><TermQuery>b</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>c</TermQuery></Clause>
        </BooleanQuery>
        """
    )
    assert q == Q.Boolean(
        must=(Q.Term("a"),),
        should=(Q.Term("b"),),
        must_not=(Q.Term("c"),),
        min_should_match=1,
    )


def test_dismax_constant_range():
    q = parse_xml(
        """
        <DisjunctionMaxQuery tieBreaker="0.3">
          <TermQuery>a</TermQuery>
          <ConstantScoreQuery boost="3.0"><TermQuery>b</TermQuery></ConstantScoreQuery>
        </DisjunctionMaxQuery>
        """
    )
    assert isinstance(q, Q.DisjunctionMax) and q.tie_breaker == 0.3
    assert q.subs[1] == Q.ConstantScore(Q.Term("b"), boost=3.0)
    r = parse_xml(
        '<RangeQuery fieldName="f" lowerTerm="AAA" upperTerm="ccc" includeUpper="false"/>'
    )
    assert r == Q.TermRange("aaa", "ccc", include_lower=True,
                            include_upper=False, field="f")
    n = parse_xml(
        '<NumericRangeQuery fieldName="price" lowerTerm="10" upperTerm="20"/>'
    )
    assert n == Q.NumericRange("price", 10, 20)


def test_user_query_delegates_to_classic():
    q = parse_xml("<UserQuery>+alpha beta</UserQuery>")
    assert q == Q.Boolean(must=(Q.Term("alpha"),), should=(Q.Term("beta"),))


def test_span_elements():
    q = parse_xml(
        """
        <SpanNear slopFactor="2" inOrder="true">
          <SpanTerm>a</SpanTerm>
          <SpanOrTerms>b c</SpanOrTerms>
        </SpanNear>
        """
    )
    assert q == Q.OrderedNear(
        2, (Q.Term("a"), Q.Boolean(should=(Q.Term("b"), Q.Term("c"))))
    )
    u = parse_xml(
        '<SpanNear slopFactor="1" inOrder="false">'
        "<SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear>"
    )
    assert u == Q.UnorderedNear(1, (Q.Term("a"), Q.Term("b")))
    f = parse_xml('<SpanFirst end="5"><SpanTerm>a</SpanTerm></SpanFirst>')
    assert f == Q.IntervalFiltered(Q.Term("a"), Q.RangeFilter(0, 4))
    s = parse_xml(
        "<SpanNot><Include><SpanNear slopFactor='1' inOrder='true'>"
        "<SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear></Include>"
        "<Exclude><SpanTerm>x</SpanTerm></Exclude></SpanNot>"
    )
    assert s == Q.NonOverlapping(
        Q.OrderedNear(1, (Q.Term("a"), Q.Term("b"))), Q.Term("x")
    )


def test_unknown_element_raises():
    with pytest.raises(ValueError, match="unknown query element"):
        parse_xml("<FuzzyLikeThisQuery>x</FuzzyLikeThisQuery>")


def test_xml_execution(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "x x x x x alpha beta"),
            (2, "beta alpha"),
        ],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="code")
    s = Searcher(idx, corpus=corpus, mode="sql")
    q = parse_xml(
        '<SpanFirst end="4"><SpanNear slopFactor="0" inOrder="true">'
        "<SpanTerm>alpha</SpanTerm><SpanTerm>beta</SpanTerm></SpanNear></SpanFirst>"
    )
    # doc 0 matches within the first 4 positions; doc 1's phrase sits past it
    got = sorted(r["doc_id"] for r in s.matching(q).collect())
    assert got == [0]
    idx.unpersist()
