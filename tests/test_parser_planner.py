"""Query parser + planner rewrite tests."""

from __future__ import annotations

from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.parser import parse
from lucene_solr_intervals_spark.search.planner import common_terms_split, rewrite


def test_parse_term():
    assert parse("Hello") == Q.Term("hello")


def test_parse_boost():
    assert parse("hello^2.5") == Q.Term("hello", boost=2.5)


def test_parse_field_binding():
    # since the multi-field engine, field prefixes BIND instead of stripping
    assert parse("content:foo") == Q.Term("foo", field="content")


def test_parse_phrase_and_slop():
    assert parse('"quick brown"') == Q.Phrase(("quick", "brown"))
    assert parse('"quick brown"~2') == Q.Phrase(("quick", "brown"), slop=2)


def test_parse_bool_default_or():
    q = parse("quick brown")
    assert isinstance(q, Q.Boolean)
    assert q.should == (Q.Term("quick"), Q.Term("brown"))


def test_parse_and():
    q = parse("quick AND brown")
    assert q.must == (Q.Term("quick"), Q.Term("brown"))


def test_parse_plus_minus():
    q = parse("+quick -fox brown")
    assert q.must == (Q.Term("quick"),)
    assert q.must_not == (Q.Term("fox"),)
    assert q.should == (Q.Term("brown"),)


def test_parse_not():
    q = parse("quick NOT fox")
    assert q.must_not == (Q.Term("fox"),)
    assert Q.Term("quick") in q.should


def test_parse_wildcard_prefix_fuzzy():
    assert parse("wild*") == Q.Prefix("wild")
    assert parse("wi?d") == Q.Wildcard("wi?d")
    assert parse("fuzzy~") == Q.Fuzzy("fuzzy", max_edits=2, edits_explicit=False)
    assert parse("fuzzy~1") == Q.Fuzzy("fuzzy", max_edits=1)


def test_parse_range():
    assert parse("[aaa TO bbb]") == Q.TermRange("aaa", "bbb", True, True)
    assert parse("{aaa TO bbb}") == Q.TermRange("aaa", "bbb", False, False)


def test_parse_group():
    q = parse("(quick OR brown) AND fox")
    assert isinstance(q, Q.Boolean)
    assert Q.Term("fox") in q.must
    inner = [c for c in q.must if isinstance(c, Q.Boolean)]
    assert inner and inner[0].should == (Q.Term("quick"), Q.Term("brown"))


def test_rewrite_single_clause_collapse():
    assert rewrite(Q.Boolean(should=(Q.Term("a"),))) == Q.Term("a")
    assert rewrite(Q.Boolean(must=(Q.Term("a"),))) == Q.Term("a")


def test_rewrite_phrase_of_one():
    assert rewrite(Q.Phrase(("a",))) == Q.Term("a")


def test_rewrite_flattens_nested_should():
    q = Q.Boolean(
        should=(Q.Boolean(should=(Q.Term("a"), Q.Term("b"))), Q.Term("c"))
    )
    r = rewrite(q)
    assert r.should == (Q.Term("a"), Q.Term("b"), Q.Term("c"))


def test_rewrite_fixpoint_nested():
    q = Q.Boolean(should=(Q.Boolean(should=(Q.Phrase(("x",)),)),))
    assert rewrite(q) == Q.Term("x")


def test_common_terms_split():
    q = Q.Boolean(must=(Q.Term("the"), Q.Term("rare")))
    out = common_terms_split(q, {"the": 900, "rare": 3}, max_doc=1000)
    assert out.must == (Q.Term("rare"),)
    assert Q.Term("the") in out.should
    # all-common degrades to disjunction
    q2 = Q.Boolean(must=(Q.Term("the"), Q.Term("a")))
    out2 = common_terms_split(q2, {"the": 900, "a": 950}, max_doc=1000)
    assert not out2.must and len(out2.should) == 2


def test_parser_fielded_syntax():
    from lucene_solr_intervals_spark.search.parser import parse
    from lucene_solr_intervals_spark.search import queries as Q

    assert parse("title:hello") == Q.Term("hello", field="title")
    assert parse("title:hello^2") == Q.Term("hello", boost=2.0, field="title")
    assert parse('title:"big apple"~3') == Q.Phrase(
        ("big", "apple"), slop=3, field="title"
    )
    assert parse("path:[a TO c]") == Q.TermRange(
        "a", "c", include_lower=True, include_upper=True, field="path"
    )
    assert parse("name:foo*") == Q.Prefix("foo", field="name")
    assert parse("name:fo?o") == Q.Wildcard("fo?o", field="name")
    assert parse("name:fozy~1") == Q.Fuzzy("fozy", max_edits=1, field="name")
    q = parse("title:fox AND body:dog")
    assert q == Q.Boolean(
        must=(Q.Term("fox", field="title"), Q.Term("dog", field="body"))
    )
    # bare terms keep the default (None) field
    assert parse("hello") == Q.Term("hello")


def test_complex_phrase_parser():
    from lucene_solr_intervals_spark.search.parser import parse_complex_phrase

    q = parse_complex_phrase('"(john jonathon) smyth*"')
    assert q.slop == 0 and len(q.slots) == 2
    assert q.slots[0] == (Q.Term("john"), Q.Term("jonathon"))
    assert q.slots[1] == (Q.Prefix("smyth"),)
    q2 = parse_complex_phrase('"vec* windo?"~2')
    assert q2.slop == 2
    assert q2.slots == ((Q.Prefix("vec"),), (Q.Wildcard("windo?"),))
    q3 = parse_complex_phrase("fuzzi~1 exact")
    assert q3.slots[0] == (Q.Fuzzy("fuzzi", max_edits=1),)
    assert q3.slots[1] == (Q.Term("exact"),)


def test_complex_phrase_execution(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher
    from lucene_solr_intervals_spark.search.parser import parse_complex_phrase

    corpus = spark.createDataFrame(
        [
            (0, "john smyth was here"),
            (1, "jonathon smythe arrived"),
            (2, "john smith stayed"),
            (3, "smyth john reversed"),
            (4, "john met smythe later on"),
        ],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="code")
    s = Searcher(idx, corpus=corpus, mode="sql")
    # exact complex phrase: (john|jonathon) then smyth* adjacent
    got = sorted(
        r["doc_id"]
        for r in s.matching(parse_complex_phrase('"(john jonathon) smyth*"')).collect()
    )
    assert got == [0, 1]
    # sloppy: ordered near with slop 2 also reaches doc 4 (one word between)
    got2 = sorted(
        r["doc_id"]
        for r in s.matching(parse_complex_phrase('"(john jonathon) smyth*"~2')).collect()
    )
    assert got2 == [0, 1, 4]
    # a slot with no dictionary match -> empty result, no error
    assert s.matching(parse_complex_phrase('"zzzz* john"')).count() == 0
    idx.unpersist()


def test_multi_field_parser_expansion():
    from lucene_solr_intervals_spark.search.parser import parse_multi_field

    q = parse_multi_field("hello title:world", fields=("title", "body"))
    # unfielded term expands to a per-field SHOULD; fielded term stays put
    assert q == Q.Boolean(
        should=(
            Q.Boolean(should=(Q.Term("hello", field="title"),
                              Q.Term("hello", field="body"))),
            Q.Term("world", field="title"),
        )
    )
    # per-field boosts multiply into each copy (MultiFieldQueryParser boosts map)
    qb = parse_multi_field("x", fields=("a", "b"), boosts={"a": 3.0})
    assert qb == Q.Boolean(
        should=(Q.Term("x", boost=3.0, field="a"), Q.Term("x", field="b"))
    )
    # single field: no wrapper boolean
    q1 = parse_multi_field("x", fields=("only",))
    assert q1 == Q.Term("x", field="only")
    # prefix/wildcard leaves expand too
    qp = parse_multi_field("pre*", fields=("a", "b"))
    assert qp == Q.Boolean(
        should=(Q.Prefix("pre", field="a"), Q.Prefix("pre", field="b"))
    )


# ---------------------------------------------- precedence (flexible) parser


def test_precedence_parser_reference_shapes():
    """TestPrecedenceQueryParser.java:217-253 expectations."""
    from lucene_solr_intervals_spark.search.parser import PrecedenceQueryParser

    p = PrecedenceQueryParser()

    def t(x):
        return Q.Term(x)

    assert p.parse("a AND b") == Q.Boolean(must=(t("a"), t("b")))
    assert p.parse("(a AND b)") == Q.Boolean(must=(t("a"), t("b")))
    assert p.parse("a && b") == Q.Boolean(must=(t("a"), t("b")))
    assert p.parse("a OR b") == Q.Boolean(should=(t("a"), t("b")))
    assert p.parse("a || b") == Q.Boolean(should=(t("a"), t("b")))
    # AND binds tighter than OR
    assert p.parse("c OR (a AND b)") == Q.Boolean(
        should=(t("c"), Q.Boolean(must=(t("a"), t("b"))))
    )
    assert p.parse("a AND b OR c AND d") == Q.Boolean(
        should=(
            Q.Boolean(must=(t("a"), t("b"))),
            Q.Boolean(must=(t("c"), t("d"))),
        )
    )
    assert p.parse("a AND NOT b") == Q.Boolean(must=(t("a"),), must_not=(t("b"),))
    assert p.parse("((a OR b) AND NOT c) OR d") == Q.Boolean(
        should=(
            Q.Boolean(must=(Q.Boolean(should=(t("a"), t("b"))),), must_not=(t("c"),)),
            t("d"),
        )
    )
    assert p.parse("+term2 -term3 term") == Q.Boolean(
        must=(t("term2"),), should=(t("term"),), must_not=(t("term3"),)
    )
    assert p.parse("(foo OR bar) AND (baz OR boo)") == Q.Boolean(
        must=(
            Q.Boolean(should=(t("foo"), t("bar"))),
            Q.Boolean(should=(t("baz"), t("boo"))),
        )
    )
    assert p.parse('term AND "phrase phrase"') == Q.Boolean(
        must=(t("term"), Q.Phrase(("phrase", "phrase")))
    )
    assert p.parse("foo:term AND field:anotherterm") == Q.Boolean(
        must=(Q.Term("term", field="foo"), Q.Term("anotherterm", field="field"))
    )


def test_precedence_parser_default_and():
    from lucene_solr_intervals_spark.search.parser import PrecedenceQueryParser

    p = PrecedenceQueryParser(default_operator="AND")
    assert p.parse("a b") == Q.Boolean(must=(Q.Term("a"), Q.Term("b")))
    assert p.parse("a b OR c") == Q.Boolean(
        should=(Q.Boolean(must=(Q.Term("a"), Q.Term("b"))), Q.Term("c"))
    )
