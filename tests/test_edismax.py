"""eDisMax parser tests.

calculateMinShouldMatch vectors transcribed from the reference
solr/core/src/test/org/apache/solr/util/SolrPluginUtilsTest.java:315-365;
clause-lexer and tree-shape behaviors follow ExtendedDismaxQParser.java
(splitIntoClauses:725, parse:140) and TestExtendedDismaxParser's
never-throws property.
"""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.edismax import (
    EDisMaxParser,
    calculate_min_should_match,
    split_into_clauses,
)


# --------------------------------------------- SolrPluginUtilsTest vectors
@pytest.mark.parametrize("clauses,spec,want", [
    (5, "0", 0), (5, "0%", 0), (5, " -5 ", 0), (5, "\n -100% \n", 0),
    (5, " \n3\n ", 3), (5, "-3", 2), (3, "3", 3), (3, "-3", 0),
    (3, "5", 3), (3, "-5", 0),
    (3, " \n25% \n", 0), (4, "25%", 1), (5, " 25% ", 1), (10, "25%", 2),
    (3, " \n-25%\n ", 3), (4, "-25%", 3), (5, "-25%", 4), (10, "-25%", 8),
    (1, "3<0", 1), (2, "3<0", 2), (3, "3<0", 3), (4, "3<0", 0), (5, "3<0", 0),
    (1, "3<25%", 1), (2, " 3\n<\n25% ", 2), (3, "3<25%", 3),
    (4, "\n 3 < \n25%\n ", 1), (5, "3<25%", 1),
    (1, "\n3 < -25% 10 < -3 \n", 1), (2, " 3 < -25% 10 < -3\n", 2),
    (3, " 3 < -25% \n 10 < -3 \n", 3), (4, " 3 < -25% 10 < -3 ", 3),
    (5, " 3 < -25% 10 < -3", 4), (6, "3<-25% 10<-3", 5),
    (7, " 3 < -25% 10 < -3 ", 6), (8, " 3 < -25% 10 \n < -3\n", 6),
    (9, " 3 < -25% 10 < -3 \n", 7), (10, " 3 < -25% 10 < -3", 8),
    (11, "3<-25% 10<-3", 8), (12, "3<-25% 10<-3", 9),
    (100, "3<-25% 10<-3", 97),
])
def test_calc_min_should_match(clauses, spec, want):
    assert calculate_min_should_match(clauses, spec) == want


# ------------------------------------------------------------ clause lexer
def test_split_basic():
    cs = split_into_clauses('foo +bar -baz "a b" f:qux')
    assert [(c.must, c.field, c.val, c.is_phrase) for c in cs] == [
        ("", None, "foo", False),
        ("+", None, "bar", False),
        ("-", None, "baz", False),
        ("", None, "a b", True),
        ("", "f", "qux", False),
    ]


def test_split_unbalanced_quote_degrades():
    # reference :833-837 — retry lexing with quotes as ordinary chars
    cs = split_into_clauses('big "unclosed phrase')
    assert [c.val for c in cs] == ["big", '"unclosed', "phrase"]
    assert not any(c.is_phrase for c in cs)


def test_split_disallowed_field_reattaches():
    cs = split_into_clauses("secret:stuff plain", uf=("title",))
    # field stays part of the term text (getFieldName allowed-check :752)
    assert cs[0].field is None and cs[0].val == "secret:stuff"
    assert cs[1].val == "plain"


def test_split_special_chars_marked_not_fatal():
    cs = split_into_clauses("wi-fi (grouped)~2")
    assert [c.val for c in cs] == ["wi-fi", "(grouped)~2"]
    assert all(c.has_special for c in cs) or cs[0].val == "wi-fi"


def test_split_never_raises_on_garbage():
    for garbage in ['""', "+", "-", ":", "a:", '""::++--', "\\", 'x \\',
                    'f:"unclosed', "AND OR NOT", "  ", ""]:
        split_into_clauses(garbage)  # must not raise


# ------------------------------------------------------------- parse trees
QF = {"text": 1.0, "source": 2.0}


def test_parse_bare_term_dismax():
    p = EDisMaxParser(QF, tie=0.3, default_field="text")
    q = p.parse("vector")
    assert isinstance(q, Q.Boolean) and len(q.should) == 1
    dm = q.should[0]
    assert isinstance(dm, Q.DisjunctionMax) and dm.tie_breaker == 0.3
    fields = {(s.field, s.boost) for s in dm.subs}
    assert fields == {("source", 2.0), (None, 1.0)}


def test_parse_plus_minus_and_mm():
    p = EDisMaxParser(QF, mm="2", default_field="text")
    q = p.parse("+alpha beta gamma -delta")
    assert len(q.must) == 1 and len(q.should) == 2 and len(q.must_not) == 1
    assert q.min_should_match == 2


def test_parse_connectives():
    p = EDisMaxParser({"text": 1.0}, default_field="text")
    q = p.parse("alpha AND beta NOT gamma")
    assert len(q.must) == 2 and len(q.must_not) == 1 and not q.should


def test_parse_quoted_phrase_qs():
    p = EDisMaxParser({"text": 1.0}, qs=2, default_field="text")
    q = p.parse('"key agg row"')
    ph = q.should[0]
    assert isinstance(ph, Q.Phrase) and ph.terms == ("key", "agg", "row")
    assert ph.slop == 2


def test_parse_fielded_clause():
    p = EDisMaxParser(QF, uf=("source",), default_field="text")
    q = p.parse("source:src17 vector")
    fielded = q.should[0]
    assert isinstance(fielded, Q.Term) and fielded.field == "source"


def test_parse_pf_phrase_boost():
    p = EDisMaxParser({"text": 1.0}, pf=("text",), ps=1, default_field="text")
    q = p.parse("key agg row")
    # outer: main MUST + phrase SHOULD (reference parse():189)
    assert len(q.must) == 1 and len(q.should) == 1
    boost = q.should[0]
    assert isinstance(boost, Q.Phrase) and boost.terms == ("key", "agg", "row")
    assert boost.slop == 1
    main = q.must[0]
    assert len(main.should) == 3


def test_parse_pf2_bigrams():
    p = EDisMaxParser({"text": 1.0}, pf2=("text",), default_field="text")
    q = p.parse("a b c")
    grams = {g.terms for g in q.should}
    assert grams == {("a", "b"), ("b", "c")}


def test_parse_never_raises():
    p = EDisMaxParser(QF, mm="3<-25%", pf=("text",), default_field="text")
    for garbage in ['"unclosed', "AND", "NOT", "+", "-a -b", "f:(x OR y)",
                    "a:b:c", "~~~", "", "   ", '""']:
        p.parse(garbage)  # never throws; may yield an empty Boolean


# ------------------------------------------------------------- end-to-end
DOCS = [
    (0, "vector merge window table", "src17"),
    (1, "vector table key agg", "src03"),
    (2, "merge window key", "src17"),
    (3, "key agg row scan", "src03"),
    (4, "vector merge key agg", "src99"),
]


@pytest.fixture(scope="module")
def searcher2f(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    idx = build_index(
        corpus, id_col="doc_id", text_col="text", analyzer="ws",
        fields={"text": "text", "source": "source"},
    )
    yield Searcher(idx, corpus=corpus, mode="sql")
    idx.unpersist()


def test_end_to_end_equals_composed_query(searcher2f):
    """edismax('vector src17 -row', mm=1) scores == the hand-composed
    dismax Boolean (the parser adds nothing the engine can't express)."""
    p = EDisMaxParser(QF, tie=0.3, mm="1", default_field="text")
    parsed = p.parse("vector src17 -row")
    dm = lambda t: Q.DisjunctionMax(
        (Q.Term(t, boost=2.0, field="source"), Q.Term(t, boost=1.0)),
        tie_breaker=0.3,
    )
    composed = Q.Boolean(
        should=(dm("vector"), dm("src17")),
        must_not=(dm("row"),),
        min_should_match=1,
    )
    got = {(r["doc_id"], round(float(r["score"]), 6))
           for r in searcher2f.scored(parsed).collect()}
    want = {(r["doc_id"], round(float(r["score"]), 6))
            for r in searcher2f.scored(composed).collect()}
    assert got == want and got  # non-vacuous
    assert {d for d, _ in got} == {0, 1, 2, 4}  # doc 3 has 'row'


# ------------------------------------------------------------ fuzz
from hypothesis import given, settings
from hypothesis import strategies as st


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)),
               max_size=80))
@settings(max_examples=500, deadline=None)
def test_parse_never_raises_fuzz(q):
    """The defining eDisMax property: ANY input yields a query tree."""
    p = EDisMaxParser(QF, tie=0.2, mm="2<-25%", pf=("text",), pf2=("text",),
                      ps=1, qs=1, uf=("source",), default_field="text")
    result = p.parse(q)
    assert isinstance(result, Q.Query)
