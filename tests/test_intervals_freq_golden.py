"""Frequency-filter golden tests, transcribed from the reference's
TestFreqFilterQueries.java (single-field cases)."""

from __future__ import annotations

from lucene_solr_intervals_spark.analysis.tokenizer import ws_tokenize
from lucene_solr_intervals_spark.intervals.kernel import collect_matches
from lucene_solr_intervals_spark.search import queries as Q

CORPUS = [
    "banana plum apple",  # 0
    "apple apple apple apple apple",  # 1
    "apple apple apple apple banana apple strawberry banana apple",  # 2
    "banana plum apple",  # 3
    "plum apple apple apple apple apple",  # 4
    "strawberry strawhat strawman",  # 5
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


def test_exact_frequency_filter():
    q = Q.IntervalFiltered(Q.Term("apple"), Q.RangeFreqFilter(5, 5))
    assert run(q) == {
        1: [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)],
        4: [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5)],
    }


def test_minimum_frequency_filter():
    q = Q.IntervalFiltered(Q.Term("apple"), Q.MinFreqFilter(5))
    assert run(q) == {
        1: [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)],
        2: [(0, 0), (1, 1), (2, 2), (3, 3), (5, 5), (8, 8)],
        4: [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5)],
    }


def test_maximum_frequency_filter():
    q = Q.IntervalFiltered(Q.Term("apple"), Q.RangeFreqFilter(1, 5))
    assert run(q) == {
        0: [(2, 2)],
        1: [(0, 0), (1, 1), (2, 2), (3, 3), (4, 4)],
        3: [(2, 2)],
        4: [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5)],
    }


def test_min_freq_over_disjunction():
    q = Q.IntervalFiltered(
        Q.Boolean(should=(Q.Term("banana"), Q.Term("plum"))), Q.MinFreqFilter(2)
    )
    assert run(q) == {
        0: [(0, 0), (1, 1)],
        2: [(4, 4), (7, 7)],
        3: [(0, 0), (1, 1)],
    }


def test_min_freq_over_expanded_prefix():
    # PrefixQuery(straw) CONSTANT_SCORE_BOOLEAN rewrite -> disjunction
    expanded = Q.Boolean(
        should=(Q.Term("strawberry"), Q.Term("strawhat"), Q.Term("strawman"))
    )
    assert run(expanded) == {
        2: [(6, 6)],
        5: [(0, 0), (1, 1), (2, 2)],
    }
    q = Q.IntervalFiltered(expanded, Q.MinFreqFilter(2))
    assert run(q) == {5: [(0, 0), (1, 1), (2, 2)]}
