"""Golden-table parity tests for the minimal-interval kernel.

Tables transcribed (FIXTURES.md F2/F3) from the reference's own tests:
  /root/reference/lucene/core/src/test/org/apache/lucene/search/intervals/
  TestBasicIntervals.java, TestBrouwerianQuery.java
Collection semantics replicate IntervalTestBase.MatchCollector (dedup +
sort by begin asc, end desc per doc).
"""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.analysis.tokenizer import ws_tokenize
from lucene_solr_intervals_spark.intervals.kernel import collect_matches, match_intervals
from lucene_solr_intervals_spark.search import queries as Q

CORPUS_A = [
    "w1 w2 w3 w4 w5",  # 0
    "w1 w3 w2 w3",  # 1
    "w1 xx w2 yy w3",  # 2
    "w1 w3 xx w2 yy w3",  # 3
    "u2 u2 u1",  # 4
    "u2 xx u2 u1",  # 5
    "u2 u2 xx u1",  # 6
    "u2 xx u2 yy u1",  # 7
    "u2 xx u1 u2",  # 8
    "u1 u2 xx u2",  # 9
    "u2 u1 xx u2",  # 10
    "t1 t2 t1 t3 t2 t3",  # 11
    "a b x x c",  # 12
]

CORPUS_B = [
    "The quick brown fox jumps over the lazy dog",  # 0
    "The quick brown duck jumps over the lazy dog with the quick brown fox "
    "jumps and then it jumps again",  # 1
]


def positions_of(corpus):
    docs = []
    for text in corpus:
        terms, positions, _ = ws_tokenize(text, lowercase=True)
        pos: dict[str, list[int]] = {}
        for t, p in zip(terms, positions):
            pos.setdefault(t, []).append(p)
        docs.append(pos)
    return docs


DOCS_A = positions_of(CORPUS_A)
DOCS_B = positions_of(CORPUS_B)


def run(query, docs):
    out = {}
    for docid, pos in enumerate(docs):
        m = collect_matches(query, pos)
        if m is not None:
            out[docid] = m
    return out


def t(name):
    return Q.Term(name)


def onear(slop, *terms):
    return Q.OrderedNear(slop, tuple(t(x) if isinstance(x, str) else x for x in terms))


def unear(slop, *terms):
    return Q.UnorderedNear(slop, tuple(t(x) if isinstance(x, str) else x for x in terms))


ORDERED_CASES = [
    (onear(0, "w1", "w2", "w3"), {0: [(0, 2)]}),
    (onear(1, "w1", "w2", "w3"), {0: [(0, 2)], 1: [(0, 3)]}),
    (onear(2, "w1", "w2", "w3"), {0: [(0, 2)], 1: [(0, 3)], 2: [(0, 4)]}),
    (onear(3, "w1", "w2", "w3"), {0: [(0, 2)], 1: [(0, 3)], 2: [(0, 4)], 3: [(0, 5)]}),
    (onear(4, "w1", "w2", "w3"), {0: [(0, 2)], 1: [(0, 3)], 2: [(0, 4)], 3: [(0, 5)]}),
    (onear(0, "w1", "w3", "w3"), {}),
    (onear(1, "w1", "w3", "w3"), {1: [(0, 3)]}),
    (onear(3, "w1", "w3", "w3"), {1: [(0, 3)], 3: [(0, 5)]}),
    (onear(0, "u2", "u2", "u1"), {4: [(0, 2)]}),
    (onear(1, "u2", "u2", "u1"), {4: [(0, 2)], 5: [(0, 3)], 6: [(0, 3)]}),
    (onear(2, "u2", "u2", "u1"), {4: [(0, 2)], 5: [(0, 3)], 6: [(0, 3)], 7: [(0, 4)]}),
    # non-overlapping successive matches (t1 t2 t1 t3 t2 t3)
    (onear(3, "t1", "t2", "t3"), {11: [(0, 3), (2, 5)]}),
]


@pytest.mark.parametrize("query,expected", ORDERED_CASES)
def test_ordered_near(query, expected):
    assert run(query, DOCS_A) == expected


def test_unordered_near_slop0():
    q = unear(0, "u1", "u2")
    assert run(q, DOCS_A) == {
        4: [(1, 2)],
        5: [(2, 3)],
        8: [(2, 3)],
        9: [(0, 1)],
        10: [(0, 1)],
    }


def test_overlapping_within_disjunctions():
    q = Q.Boolean(should=(unear(6, "a", "c"), unear(6, "b", "c")))
    assert run(q, DOCS_A) == {12: [(0, 4), (1, 4)]}


def test_overlapping_within_disjunctions2():
    q = Q.Boolean(should=(unear(6, "a", "b"), unear(6, "a", "c")))
    # sorted begin asc, end desc: (0,4) before (0,1)
    assert run(q, DOCS_A) == {12: [(0, 4), (0, 1)]}


def test_nested_near_conjunction():
    # ((u1 near/0 u2) AND xx) -> BooleanQuery MUST merges child streams
    q = Q.Boolean(must=(unear(0, "u1", "u2"), t("xx")))
    assert run(q, DOCS_A) == {
        5: [(1, 1), (2, 3)],
        8: [(1, 1), (2, 3)],
        9: [(0, 1), (2, 2)],
        10: [(0, 1), (2, 2)],
    }


def test_single_term_disjunction():
    q = Q.Boolean(should=(t("w5"),))
    assert run(q, DOCS_A) == {0: [(4, 4)]}


BROUWERIAN_CASES = [
    (
        Q.NonOverlapping(onear(2, "the", "quick", "jumps"), t("duck")),
        {0: [(0, 4)], 1: [(10, 14)]},
    ),
    (
        Q.NonOverlapping(onear(2, "the", "quick", "jumps"), t("blox")),
        {0: [(0, 4)], 1: [(0, 4), (10, 14)]},
    ),
    (
        Q.NonOverlapping(t("jumps"), unear(2, "jumps", "duck")),
        {0: [(4, 4)], 1: [(14, 14), (18, 18)]},
    ),
    (Q.NonOverlapping(t("dog"), unear(2, "dog", "over")), {}),
    (Q.NonOverlapping(t("dog"), unear(1, "dog", "over")), {0: [(8, 8)], 1: [(8, 8)]}),
    (
        Q.NonOverlapping(
            t("jumps"), unear(1, t("jumps"), Q.Boolean(should=(t("fox"), t("duck"))))
        ),
        {1: [(18, 18)]},
    ),
]


@pytest.mark.parametrize("query,expected", BROUWERIAN_CASES)
def test_brouwerian(query, expected):
    assert run(query, DOCS_B) == expected


def test_match_intervals_basic():
    # the raw emitted-composite API (engine path, no collector semantics)
    pos = DOCS_A[0]
    assert match_intervals(onear(0, "w1", "w2", "w3"), pos) == [(0, 2)]
    assert match_intervals(t("w5"), pos) == [(4, 4)]
    assert match_intervals(t("zz"), pos) is None


def test_phrase_block():
    # exact phrase via BlockIter
    q = Q.Phrase(("w1", "w2"), slop=0)
    assert run(q, DOCS_A).keys() == {0}
    q2 = Q.Phrase(("u2", "u2", "u1"), slop=0)
    assert 4 in run(q2, DOCS_A)
    q3 = Q.Phrase(("w1", "w3"), slop=0)
    res = run(q3, DOCS_A)
    assert set(res.keys()) == {1, 3}


def test_range_interval_filter():
    # "in first N positions" window
    q = Q.IntervalFiltered(t("w3"), Q.RangeFilter(0, 2))
    res = run(q, DOCS_A)
    assert res == {0: [(2, 2)], 1: [(1, 1)], 3: [(1, 1)]}


def test_min_freq_filter():
    q = Q.IntervalFiltered(t("u2"), Q.MinFreqFilter(2))
    res = run(q, DOCS_A)
    assert set(res.keys()) == {4, 5, 6, 7, 8, 9, 10}
    q3 = Q.IntervalFiltered(t("u2"), Q.MinFreqFilter(3))
    assert set(run(q3, DOCS_A).keys()) == set()


def test_range_freq_filter():
    q = Q.IntervalFiltered(t("u2"), Q.RangeFreqFilter(1, 1))
    res = run(q, DOCS_A)
    assert set(res.keys()) == set()  # every u1..u10 doc has exactly 2 u2... check
