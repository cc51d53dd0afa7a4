"""Nested interval-filter golden tests, transcribed from the reference's
TestNestedIntervalFilterQueries.java (checkIntervals tables)."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.analysis.tokenizer import ws_tokenize
from lucene_solr_intervals_spark.intervals.kernel import collect_matches
from lucene_solr_intervals_spark.search import queries as Q

CORPUS = [
    "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12",  # 0
    "w1 w3 w4 w5 w6 w7 w8",  # 1
    "w1 w3 w10 w4 w5 w6 w7 w8",  # 2
    "w1 w3 w2 w4 w5 w6 w7 w8",  # 3
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


DOCS = positions_of(CORPUS)


def run(query):
    out = {}
    for docid, pos in enumerate(DOCS):
        m = collect_matches(query, pos)
        if m is not None:
            out[docid] = m
    return out


def t(name):
    return Q.Term(name)


def onear(slop, *subs, collect_leaves=False):
    return Q.OrderedNear(
        slop, tuple(t(x) if isinstance(x, str) else x for x in subs), collect_leaves
    )


def unear(slop, *subs, collect_leaves=False):
    return Q.UnorderedNear(
        slop, tuple(t(x) if isinstance(x, str) else x for x in subs), collect_leaves
    )


def test_ordered_disjunction_no_match():
    # subparts present but slop=0 not satisfiable -> no hits
    q = Q.Boolean(
        should=(onear(0, "w1", "w8", "w4"), onear(0, "w3", "w7", "w6"))
    )
    assert run(q) == {}


def test_filter_disjunction_query():
    # or(w4, w1 pre/3 w10)
    q = Q.Boolean(should=(t("w4"), onear(3, "w1", "w10")))
    assert run(q) == {
        0: [(3, 3)],
        1: [(2, 2)],
        2: [(0, 2), (3, 3)],
        3: [(3, 3)],
    }


def test_or_near_near_query():
    # or(w1 pre/2 w2, w1 pre/3 w10)
    q = Q.Boolean(should=(onear(2, "w1", "w2"), onear(3, "w1", "w10")))
    assert run(q) == {
        0: [(0, 1)],
        2: [(0, 2)],
        3: [(0, 2)],
    }


def test_unordered_near_near_query():
    # or(w2 within/2 w1, w10 within/3 w1)
    q = Q.Boolean(should=(unear(2, "w2", "w1"), unear(3, "w10", "w1")))
    assert run(q) == {
        0: [(0, 1)],
        2: [(0, 2)],
        3: [(0, 2)],
    }


def test_near_near_near_query():
    # (w1 pre/2 w4) pre/6 (w10 pre/2 w12) with default collectLeaves=true
    near1 = onear(2, "w1", "w4")
    near2 = onear(2, "w10", "w12")
    q = onear(6, near1, near2, collect_leaves=True)
    assert run(q) == {0: [(0, 11), (0, 3), (9, 11)]}


def test_or_near_near_nonexistent():
    # MUST(or(two unsatisfiable nears)) + MUST_NOT(foo) -> no hits
    q = Q.Boolean(
        must=(
            Q.Boolean(should=(onear(2, "w1", "w12"), onear(2, "w3", "w8"))),
        ),
        must_not=(t("foo"),),
    )
    assert run(q) == {}


# --- TestConjunctionIntervalIterator.java (pease porridge corpus) ---

PEASE = [
    "Pease porridge hot! Pease porridge cold! Pease porridge in the pot nine "
    "days old! Some like it hot, some like it cold, Some like it in the pot "
    "nine days old! Pease porridge hot! Pease porridge cold!",
    "Pease porridge cold! Pease porridge hot! Pease porridge in the pot nine "
    "days old! Some like it cold, some like it hot, Some like it in the pot "
    "nine days old! Pease porridge cold! Pease porridge hot!",
]

PEASE_DOCS = positions_of(PEASE)


def run_pease(query):
    out = {}
    for docid, pos in enumerate(PEASE_DOCS):
        m = collect_matches(query, pos)
        if m is not None:
            out[docid] = m
    return out


def test_conjunction_ordered_pease():
    q = onear(0, "pease", "porridge", "hot!")
    assert run_pease(q) == {
        0: [(0, 2), (31, 33)],
        1: [(3, 5), (34, 36)],
    }


def test_conjunction_unordered_pease():
    q = unear(0, "pease", "porridge", "hot!")
    assert run_pease(q) == {
        0: [(0, 2), (1, 3), (2, 4), (31, 33), (32, 34), (33, 35)],
        1: [(3, 5), (4, 6), (5, 7), (34, 36)],
    }


def test_conjunction_exclusion_no_match():
    inner = Q.Boolean(
        must=(t("pease"),),
        must_not=(Q.Boolean(should=(t("porridge"), t("flurble"))),),
    )
    q = Q.Boolean(must=(inner,), must_not=(Q.Boolean(should=(t("foo"), t("bar"))),))
    assert run_pease(q) == {}


# --- TestDisjunctionIntervalIterator.java (pease + fox corpus) ---

DISJ = PEASE + ["The quick brown fox jumps over the lazy porridge"]
DISJ_DOCS = positions_of(DISJ)


def run_disj(query):
    out = {}
    for docid, pos in enumerate(DISJ_DOCS):
        m = collect_matches(query, pos)
        if m is not None:
            out[docid] = m
    return out


def test_disjunction_over_conjunctions():
    conj1 = Q.Boolean(must=(t("hot!"), t("porridge")))
    conj2 = Q.Boolean(must=(t("fox"), t("porridge")))
    q = Q.Boolean(should=(conj1, conj2))
    assert run_disj(q) == {
        0: [(1, 1), (2, 2), (4, 4), (7, 7), (32, 32), (33, 33), (35, 35)],
        1: [(1, 1), (4, 4), (5, 5), (7, 7), (32, 32), (35, 35), (36, 36)],
        2: [(3, 3), (8, 8)],
    }


def test_disjunction_range_positions():
    q = Q.IntervalFiltered(
        Q.Boolean(should=(t("porridge"), t("pease"), t("hot!"))),
        Q.RangeFilter(0, 2),
    )
    assert run_disj(q) == {
        0: [(0, 0), (1, 1), (2, 2)],
        1: [(0, 0), (1, 1)],
    }


def test_disjunction_partial_match():
    q = Q.Boolean(should=(t("porridge"), t("fox")))
    assert run_disj(q) == {
        0: [(1, 1), (4, 4), (7, 7), (32, 32), (35, 35)],
        1: [(1, 1), (4, 4), (7, 7), (32, 32), (35, 35)],
        2: [(3, 3), (8, 8)],
    }


def test_disjunction_full_match():
    q = Q.Boolean(should=(t("porridge"), t("pease"), t("hot!")))
    assert run_disj(q) == {
        0: [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4), (6, 6), (7, 7),
            (31, 31), (32, 32), (33, 33), (34, 34), (35, 35)],
        1: [(0, 0), (1, 1), (3, 3), (4, 4), (5, 5), (6, 6), (7, 7),
            (31, 31), (32, 32), (34, 34), (35, 35), (36, 36)],
        2: [(8, 8)],
    }


# --- TestExoticQueries.java + TestBlockIntervalIterator.java ---

EXOTIC_DOCS = positions_of([PEASE[0]])


def run_exotic(query):
    m = collect_matches(query, EXOTIC_DOCS[0])
    return {0: m} if m is not None else {}


def test_exact_phrase_collects_leaves():
    q = Q.Phrase(("pease", "porridge", "hot!"))
    assert run_exotic(q) == {
        0: [(0, 2), (0, 0), (1, 1), (2, 2), (31, 33), (31, 31), (32, 32), (33, 33)]
    }


def test_multiterm_phrase_collects_leaves():
    q = Q.MultiPhrase((("pease",), ("porridge",), ("hot!", "cold!")))
    assert run_exotic(q) == {
        0: [
            (0, 2), (0, 0), (1, 1), (2, 2),
            (3, 5), (3, 3), (4, 4), (5, 5),
            (31, 33), (31, 31), (32, 32), (33, 33),
            (34, 36), (34, 34), (35, 35), (36, 36),
        ]
    }


def test_matching_block_interval_filter():
    q = Q.IntervalFiltered(
        Q.Boolean(must=(t("pease"), t("porridge"), t("hot!"))), Q.BlockFilter()
    )
    assert run_pease(q) == {
        0: [(0, 2), (31, 33)],
        1: [(3, 5), (34, 36)],
    }


def test_partial_matching_block_interval_filter():
    q = Q.IntervalFiltered(
        Q.Boolean(
            must=(t("pease"), t("porridge"), t("hot!"), t("pease"), t("porridge"), t("cold!"))
        ),
        Q.BlockFilter(),
    )
    assert run_exotic(q) == {0: [(0, 5), (31, 36)]}


def test_non_matching_block_interval_filter():
    q = Q.IntervalFiltered(Q.Boolean(must=(t("pease"), t("hot!"))), Q.BlockFilter())
    assert run_exotic(q) == {}
