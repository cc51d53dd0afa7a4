"""TestBooleanMinShouldMatch transcription (lucene/core/src/test/org/
apache/lucene/search/TestBooleanMinShouldMatch.java).

The reference's 8-doc two-field corpus (:48-70) — `all:all` on every doc,
`data` text on six of them — with every named minimumNumberShouldMatch
case (:108-305) plus a deterministic variant of testRandomQueries
(:307-345): random boolean trees with a random minNrShouldMatch verified
against a pure-Python brute force over the same corpus.
"""

from __future__ import annotations

import itertools
import random

import pytest

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher

DATA = [
    "A 1 2 3 4 5 6",
    "Z       4 5 6",
    None,
    "B   2   4 5 6",
    "Y     3   5 6",
    None,
    "C     3     6",
    "X       4 5 6",
]


@pytest.fixture(scope="module")
def searcher(spark):
    rows = [(i, "all", d if d is not None else "") for i, d in enumerate(DATA)]
    corpus = spark.createDataFrame(rows, ["doc_id", "all", "data"])
    idx = build_index(
        corpus, analyzer="ws", fields={"all": "all", "data": "data"}
    )
    s = Searcher(idx, corpus=corpus, mode="sql")
    yield s
    idx.unpersist()


def T(t, f="data"):  # noqa: N802
    return Q.Term(t, field=f)


def nr_hits(searcher, q):
    return searcher.matching(q).count()


CASES = [
    # testAllOptional (:108-116): 2 of 4 optional
    (Q.Boolean(should=tuple(T(str(i)) for i in (1, 2, 3, 4)), min_should_match=2), 2),
    # testOneReqAndSomeOptional (:118-130)
    (Q.Boolean(must=(T("all", "all"),), should=(T("5"), T("4"), T("3")),
               min_should_match=2), 5),
    # testSomeReqAndSomeOptional (:132-145)
    (Q.Boolean(must=(T("all", "all"), T("6")), should=(T("5"), T("4"), T("3")),
               min_should_match=2), 5),
    # testOneProhibAndSomeOptional (:147-159)
    (Q.Boolean(should=(T("1"), T("2"), T("4")), must_not=(T("3"),),
               min_should_match=2), 1),
    # testSomeProhibAndSomeOptional (:161-174)
    (Q.Boolean(should=(T("1"), T("2"), T("4")), must_not=(T("3"), T("C")),
               min_should_match=2), 1),
    # testOneReqOneProhibAndSomeOptional (:176-190)
    (Q.Boolean(must=(T("6"),), should=(T("5"), T("4"), T("2"), T("1")),
               must_not=(T("3"),), min_should_match=3), 1),
    # testSomeReqOneProhibAndSomeOptional (:192-207)
    (Q.Boolean(must=(T("all", "all"), T("6")),
               should=(T("5"), T("4"), T("2"), T("1")),
               must_not=(T("3"),), min_should_match=3), 1),
    # testOneReqSomeProhibAndSomeOptional (:209-224)
    (Q.Boolean(must=(T("6"),), should=(T("5"), T("4"), T("2"), T("1")),
               must_not=(T("3"), T("C")), min_should_match=3), 1),
    # testSomeReqSomeProhibAndSomeOptional (:226-242)
    (Q.Boolean(must=(T("all", "all"), T("6")),
               should=(T("5"), T("4"), T("2"), T("1")),
               must_not=(T("3"), T("C")), min_should_match=3), 1),
    # testMinHigherThenNumOptional (:244-260): 90 of 4 -> nothing
    (Q.Boolean(must=(T("all", "all"), T("6")),
               should=(T("5"), T("4"), T("2"), T("1")),
               must_not=(T("3"), T("C")), min_should_match=90), 0),
    # testMinEqualToNumOptional (:262-273): 2 of 2
    (Q.Boolean(must=(T("6"), T("3")), should=(T("all", "all"), T("2")),
               min_should_match=2), 1),
    # testOneOptionalEqualToMin (:275-285)
    (Q.Boolean(must=(T("all", "all"), T("2")), should=(T("3"),),
               min_should_match=1), 1),
    # testNoOptionalButMin (:287-296): 1 of 0 optional -> nothing
    (Q.Boolean(must=(T("all", "all"), T("2")), min_should_match=1), 0),
    # testNoOptionalButMin2 (:298-305)
    (Q.Boolean(must=(T("all", "all"),), min_should_match=1), 0),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_named_min_should_cases(searcher, case):
    q, expected = CASES[case]
    assert nr_hits(searcher, q) == expected


# ------------------------------------------------ deterministic random part


def _brute(q: Q.Boolean) -> set[int]:
    docs = {
        i: {"all": {"all"}, "data": set((d or "").split())}
        for i, d in enumerate(DATA)
    }

    def matches(i, node):
        if isinstance(node, Q.Term):
            return node.term in docs[i][node.field or "data"]
        assert isinstance(node, Q.Boolean)
        if any(not matches(i, c) for c in node.must):
            return False
        if any(matches(i, c) for c in node.must_not):
            return False
        n_opt = sum(matches(i, c) for c in node.should)
        need = max(node.min_should_match, 0)
        if node.should and not node.must and need == 0:
            need = 1  # pure disjunction needs one should
        return n_opt >= need

    return {i for i in docs if matches(i, q)}


def test_random_min_should_vs_brute_force(searcher):
    """testRandomQueries (:307-345), deterministic: random flat boolean
    queries with random minNrShouldMatch (0..opt+1) and an occasional
    random negation, verified doc-set-exact against brute force."""
    vals = ["1", "2", "3", "4", "5", "6", "A", "Z", "B", "Y", "X", "foo"]
    rng = random.Random(1234)
    for _ in range(40):
        n_should = rng.randint(1, 4)
        should = tuple(T(rng.choice(vals)) for _ in range(n_should))
        must = tuple(T(rng.choice(vals)) for _ in range(rng.randint(0, 2)))
        must_not = (
            (T(rng.choice(vals)),) if rng.random() < 0.5 else ()
        )
        msm = rng.randint(0, n_should + 1)
        q = Q.Boolean(
            must=must, should=should, must_not=must_not, min_should_match=msm
        )
        got = {r["doc_id"] for r in searcher.matching(q).collect()}
        assert got == _brute(q), q
