"""Surround query parser: grammar + execution.

Semantics reference: surround/parser/QueryParser.jj (W ordered :370,
N unordered :351, distance default 1 :127-132, slop = distance - 1 via
DistanceQuery.java:100 SpanNearQuery(clauses, opDistance - 1, ordered)).
"""

from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.surround import parse_surround


def test_distance_ops():
    # W = ordered, default distance 1 -> slop 0
    assert parse_surround("a w b") == Q.OrderedNear(0, (Q.Term("a"), Q.Term("b")))
    assert parse_surround("a 3W b") == Q.OrderedNear(2, (Q.Term("a"), Q.Term("b")))
    # N = unordered
    assert parse_surround("a N b") == Q.UnorderedNear(0, (Q.Term("a"), Q.Term("b")))
    assert parse_surround("a 5n b") == Q.UnorderedNear(4, (Q.Term("a"), Q.Term("b")))


def test_left_assoc_nesting():
    # each distance token wraps the accumulated query (QueryParser.jj:345-373)
    q = parse_surround("a w b 3w c")
    assert q == Q.OrderedNear(
        2, (Q.OrderedNear(0, (Q.Term("a"), Q.Term("b"))), Q.Term("c"))
    )


def test_precedence():
    # W binds tighter than N, N tighter than NOT, NOT tighter than AND, AND
    # tighter than OR (production nesting OrQuery -> ... -> WQuery)
    q = parse_surround("a OR b AND c N d W e")
    inner_w = Q.OrderedNear(0, (Q.Term("d"), Q.Term("e")))
    inner_n = Q.UnorderedNear(0, (Q.Term("c"), inner_w))
    assert q == Q.Boolean(
        should=(Q.Term("a"), Q.Boolean(must=(Q.Term("b"), inner_n)))
    )


def test_not_query():
    q = parse_surround("a NOT b NOT c")
    assert q == Q.Boolean(must=(Q.Term("a"),), must_not=(Q.Term("b"), Q.Term("c")))


def test_prefix_operator_forms():
    assert parse_surround("3W(a, b, c)") == Q.OrderedNear(
        2, (Q.Term("a"), Q.Term("b"), Q.Term("c"))
    )
    assert parse_surround("N(a, b)") == Q.UnorderedNear(0, (Q.Term("a"), Q.Term("b")))
    assert parse_surround("AND(a, b)") == Q.Boolean(must=(Q.Term("a"), Q.Term("b")))
    assert parse_surround("OR(a, b, c)") == Q.Boolean(
        should=(Q.Term("a"), Q.Term("b"), Q.Term("c"))
    )


def test_truncated_terms():
    q = parse_surround("pre* W mid?dle")
    assert q == Q.OrderedNear(0, (Q.Prefix("pre"), Q.Wildcard("mid?dle")))


def test_boost_and_field():
    q = parse_surround("a^2.5")
    assert isinstance(q, Q.Term) and q.boost == 2.5
    q2 = parse_surround("title:a W title:b")
    assert q2.subs[0].field == "title" and q2.subs[1].field == "title"
    q3 = parse_surround("a w b", field="body")
    assert q3.subs[0].field == "body"


def test_parse_errors():
    import pytest

    for bad in ["", "a W", "W(a)", "(a", "a)"]:
        with pytest.raises((ValueError, AttributeError)):
            parse_surround(bad)


def test_surround_execution(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "alpha x beta"),
            (2, "beta alpha"),
            (3, "alpha x x x beta"),
            (4, "alpha beta delta"),
        ],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="code")
    s = Searcher(idx, corpus=corpus, mode="sql")

    def ids(q):
        return sorted(r["doc_id"] for r in s.matching(q).collect())

    # W default distance: ordered adjacent
    assert ids(parse_surround("alpha w beta")) == [0, 4]
    # 2W: one gap allowed, ordered
    assert ids(parse_surround("alpha 2w beta")) == [0, 1, 4]
    # N: unordered adjacent reaches the reversed doc
    assert ids(parse_surround("alpha n beta")) == [0, 2, 4]
    # NOT excludes
    assert ids(parse_surround("alpha w beta NOT delta")) == [0]
    # truncation inside a distance op (expanded against the term dict)
    assert ids(parse_surround("alpha 2w bet*")) == [0, 1, 4]
    # prefix form with three operands
    assert ids(parse_surround("W(alpha, beta, gamma)")) == [0]
    idx.unpersist()


def test_render_parse_roundtrip():
    """Property: rendering a random distance/boolean tree to surround syntax
    and re-parsing reproduces the tree (grammar round-trip)."""
    import random

    rng = random.Random(99)

    def rand_tree(depth):
        r = rng.random()
        if depth >= 3 or r < 0.35:
            t = "t" + str(rng.randint(0, 9))
            return Q.Term(t), t
        kids = [rand_tree(depth + 1) for _ in range(2)]
        if r < 0.55:
            d = rng.randint(1, 9)
            # infix W binds tightest -> parenthesize non-leaf operands
            parts = [
                s if isinstance(q, Q.Term) else f"({s})" for q, s in kids
            ]
            return (
                Q.OrderedNear(d - 1, tuple(q for q, _ in kids)),
                f" {d}W ".join(parts),
            )
        if r < 0.7:
            d = rng.randint(1, 9)
            parts = [
                s if isinstance(q, (Q.Term, Q.OrderedNear)) else f"({s})"
                for q, s in kids
            ]
            return (
                Q.UnorderedNear(d - 1, tuple(q for q, _ in kids)),
                f" {d}N ".join(parts),
            )
        if r < 0.85:
            return (
                Q.Boolean(must=tuple(q for q, _ in kids)),
                " AND ".join(f"({s})" for _, s in kids),
            )
        return (
            Q.Boolean(should=tuple(q for q, _ in kids)),
            " OR ".join(f"({s})" for _, s in kids),
        )

    for _ in range(200):
        tree, text = rand_tree(0)
        assert parse_surround(text) == tree, text
