"""Vectorized SloppyPhraseScorer walk for 2-distinct-term phrases.

The classic-scorer sloppy phrase (PhraseQuery.java:296 ->
SloppyPhraseScorer.java:117-147) was the engine's last per-doc Python
kernel.  For two distinct terms there are no repeat collisions, and the
walk decomposes into consumption segments (intervals/vectorized.py
classic_sloppy_2).  These tests pin the vectorized kernel against the
transcribed walk (search/sloppy.py) — property-level, golden-corpus, and
end-to-end through both the exploded Searcher and the packed
SegmentSearcher.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_intervals_spark.intervals.vectorized import (
    classic_sloppy_2,
    fast_shape,
)
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.sloppy import sloppy_slots_freq

STRIDE = 128


def _walk(A, B, slop):
    return sloppy_slots_freq(
        [frozenset(("a",)), frozenset(("b",))], {"a": A, "b": B}, slop
    )


def _kernel_multi(doc_positions, slop):
    """doc_positions: {doc: (A, B)} -> {doc: (n, freq)} via one kernel call
    over adjusted keys (a: pos+1, b: pos; offsets 0/1, shift C=1)."""
    ak, bk = [], []
    for d, (A, B) in doc_positions.items():
        ak += [d * STRIDE + p + 1 for p in A]
        bk += [d * STRIDE + p for p in B]
    docs, nm, fr = classic_sloppy_2(
        np.array(sorted(ak), dtype=np.int64),
        np.array(sorted(bk), dtype=np.int64),
        slop,
        STRIDE,
    )
    return {int(d): (int(n), round(float(f), 9)) for d, n, f in zip(docs, nm, fr)}


@given(
    data=st.lists(
        st.tuples(
            st.lists(st.integers(0, 100), min_size=0, max_size=10, unique=True),
            st.lists(st.integers(0, 100), min_size=0, max_size=10, unique=True),
        ),
        min_size=1,
        max_size=8,
    ),
    slop=st.integers(0, 12),
)
@settings(max_examples=400, deadline=None)
def test_kernel_equals_walk_property(data, slop):
    want = {}
    doc_positions = {}
    for d, (A, B) in enumerate(data):
        A, B = sorted(A), sorted(B)
        doc_positions[d] = (A, B)
        if A and B:
            n, f = _walk(A, B, slop)
            if n:
                want[d] = (n, round(f, 9))
    assert _kernel_multi(doc_positions, slop) == want


def test_kernel_tie_and_crossing_cases():
    """Hand cases that distinguish the walk from the naive alternating-pair
    rule: running-max end, tie consumption (strict-> crossing), exhaustion."""
    cases = [
        ([6, 11, 21], [21, 22, 29], 2),
        ([15, 21], [5, 8, 16, 19, 27], 7),
        ([0, 8, 12, 29], [9, 13, 22, 23], 9),
        ([1, 17], [4, 17, 18], 7),
        ([0], [0], 0),  # same raw position: adjusted distance 1
        ([0, 4], [2, 6], 4),
        ([5], [4], 0),  # "b a" adjacency: adjusted b'=3, d=2
    ]
    for A, B, slop in cases:
        want = _walk(A, B, slop)
        got = _kernel_multi({0: (A, B)}, slop).get(0, (0, 0.0))
        assert got == (want[0], round(want[1], 9)), (A, B, slop)


def test_fast_shape_routing():
    # classic 2-distinct-term phrase -> vectorized classic walk
    assert fast_shape(Q.Phrase(("a", "b"), slop=2))[0] == "csloppy2"
    # repeats -> the collision-cascade lockstep walk (LUCENE-3412 territory,
    # vectorized in round 9)
    assert fast_shape(Q.Phrase(("a", "a"), slop=2))[0] == "csloppyr"
    assert fast_shape(Q.Phrase(("a", "b", "a"), slop=2))[0] == "csloppyr"
    # k distinct terms -> the k-pointer vectorized walk
    assert fast_shape(Q.Phrase(("a", "b", "c"), slop=2))[0] == "csloppyk"
    # intervals-scorer phrase keeps the intervals-module kernel
    assert fast_shape(Q.Phrase(("a", "b"), slop=2, scorer="intervals"))[0] == "sloppy2"
    assert fast_shape(Q.Phrase(("a", "b", "c"), slop=2, scorer="intervals")) is None
    assert fast_shape(Q.Phrase(("a", "b", "a"), slop=2, scorer="intervals")) is None
    # MultiPhrase: singleton slots degenerate to the term walk
    assert fast_shape(Q.MultiPhrase((("a",), ("b",)), slop=3))[0] == "csloppy2"
    assert fast_shape(Q.MultiPhrase((("a",), ("b",), ("c",)), slop=3))[0] == "csloppyk"
    assert fast_shape(Q.MultiPhrase((("a",), ("b",), ("a",)), slop=3))[0] == "csloppyr"
    assert fast_shape(Q.MultiPhrase((("a", "x"), ("b",)), slop=3)) is None


DOCS = [
    (0, "table hash join table merge hash"),
    (1, "hash table"),
    (2, "table x y z hash table hash x table"),
    (3, "merge sort only"),
    (4, "hash hash hash table"),
    (5, "table y hash y table y y hash y y y table"),
]


@pytest.fixture(scope="module")
def searchers(spark, tmp_path_factory):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.index.segment import build_segments
    from lucene_solr_intervals_spark.search.executor import Searcher
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    corpus = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_index(corpus, analyzer="ws")
    s = Searcher(idx, corpus=corpus, mode="lucene")
    index_dir = str(tmp_path_factory.mktemp("csloppy") / "idx")
    build_segments(corpus, index_dir, n_segments=2, id_col="doc_id",
                   text_col="text", analyzer="ws", n_docs_hint=len(DOCS))
    ss = SegmentSearcher(spark, index_dir)
    yield s, ss
    idx.unpersist()


def test_end_to_end_kernel_equals_forced_walk(searchers, monkeypatch):
    """Searcher scores via the vectorized kernel == scores with the kernel
    disabled (fast_shape -> None forces the per-doc walk), packed path too."""
    import lucene_solr_intervals_spark.intervals.vectorized as VK

    s, ss = searchers
    queries = [
        Q.Phrase(("table", "hash"), slop=sl) for sl in (0, 1, 2, 4, 8)
    ] + [Q.Phrase(("hash", "table"), slop=2), Q.MultiPhrase((("table",), ("hash",)), slop=3)]
    for q in queries:
        if getattr(q, "slop", 0) > 0:
            assert VK.fast_shape(q)[0] == "csloppy2", q
        fast = {(r["doc_id"], round(float(r["score"]), 5))
                for r in s.scored(q).collect()}
        packed = {(r["doc_id"], round(float(r["score"]), 5))
                  for r in ss.search_intervals(q, k=20).collect()}
        with monkeypatch.context() as m:
            m.setattr(VK, "fast_shape", lambda _q: None)
            walk = {(r["doc_id"], round(float(r["score"]), 5))
                    for r in s.scored(q).collect()}
        assert fast == walk, q
        assert packed == fast, q


def test_golden_corpus_two_term_subqueries(searchers):
    """On the TestSloppyPhraseQuery golden corpus shapes (X/A runs), 2-term
    no-repeat subqueries score identically through kernel and walk."""
    texts = {
        0: "X A A A Y",
        1: "X A 1 2 3 A 4 5 6 A Y",
        2: "A A X A X B A X B B A A X B A A",
        3: "H H H X X X H H H X X X H H H",
    }
    for slop in range(0, 8):
        for terms in [("x", "a"), ("a", "x"), ("x", "b"), ("h", "x")]:
            for d, text in texts.items():
                toks = [t.lower() for t in text.split()]
                pos = {}
                for i, t in enumerate(toks):
                    pos.setdefault(t, []).append(i)
                A = pos.get(terms[0], [])
                B = pos.get(terms[1], [])
                if not A or not B:
                    continue
                want = _walk(A, B, slop)
                got = _kernel_multi({d: (A, B)}, slop).get(d, (0, 0.0))
                assert got == (want[0], round(want[1], 9)), (d, terms, slop)


# ------------------------------------------------------- k-term kernel


def _kernel_k(doc_positions, slop, k):
    """doc_positions: {doc: [P0..Pk-1]} -> {doc: (n, freq)}; slot j keys
    adjusted by C - j, C = k - 1 (csloppy2's +1/+0 generalized)."""
    from lucene_solr_intervals_spark.intervals.vectorized import classic_sloppy_k

    keys = []
    for j in range(k):
        arr = []
        for d, plists in doc_positions.items():
            arr += [d * STRIDE + p + (k - 1 - j) for p in plists[j]]
        keys.append(np.array(sorted(arr), dtype=np.int64))
    docs, nm, fr = classic_sloppy_k(keys, slop, STRIDE)
    return {int(d): (int(n), round(float(f), 9)) for d, n, f in zip(docs, nm, fr)}


def _walk_k(plists, slop):
    terms = [f"t{j}" for j in range(len(plists))]
    return sloppy_slots_freq(
        [frozenset((t,)) for t in terms],
        {t: list(p) for t, p in zip(terms, plists)},
        slop,
    )


@given(
    data=st.lists(
        st.lists(
            st.lists(st.integers(0, 60), min_size=0, max_size=6, unique=True),
            min_size=3,
            max_size=3,
        ),
        min_size=1,
        max_size=6,
    ),
    slop=st.integers(0, 10),
)
@settings(max_examples=300, deadline=None)
def test_kernel_k3_equals_walk_property(data, slop):
    want = {}
    doc_positions = {}
    for d, plists in enumerate(data):
        plists = [sorted(p) for p in plists]
        doc_positions[d] = plists
        if all(plists):
            n, f = _walk_k(plists, slop)
            if n:
                want[d] = (n, round(f, 9))
    assert _kernel_k(doc_positions, slop, 3) == want


@given(
    data=st.lists(
        st.lists(
            st.lists(st.integers(0, 80), min_size=1, max_size=5, unique=True),
            min_size=4,
            max_size=5,
        ),
        min_size=1,
        max_size=5,
    ),
    slop=st.integers(0, 14),
)
@settings(max_examples=200, deadline=None)
def test_kernel_k45_equals_walk_property(data, slop):
    want = {}
    doc_positions = {}
    k = len(data[0])
    data = [p for p in data if len(p) == k]
    for d, plists in enumerate(data):
        plists = [sorted(p) for p in plists]
        doc_positions[d] = plists
        n, f = _walk_k(plists, slop)
        if n:
            want[d] = (n, round(f, 9))
    assert _kernel_k(doc_positions, slop, k) == want


def test_end_to_end_k3_kernel_equals_forced_walk(searchers, monkeypatch):
    """3-term classic sloppy phrase: kernel == forced per-doc walk, packed
    path too (the round-7 vectorization of the k-term no-repeats case)."""
    import lucene_solr_intervals_spark.intervals.vectorized as VK

    s, ss = searchers
    queries = [
        Q.Phrase(("table", "hash", "join"), slop=sl) for sl in (1, 2, 4, 8)
    ] + [
        Q.Phrase(("hash", "table", "merge"), slop=6),
        Q.MultiPhrase((("table",), ("hash",), ("join",)), slop=5),
    ]
    for q in queries:
        assert VK.fast_shape(q)[0] == "csloppyk", q
        fast = {(r["doc_id"], round(float(r["score"]), 5))
                for r in s.scored(q).collect()}
        packed = {(r["doc_id"], round(float(r["score"]), 5))
                  for r in ss.search_intervals(q, k=20).collect()}
        with monkeypatch.context() as m:
            m.setattr(VK, "fast_shape", lambda _q: None)
            walk = {(r["doc_id"], round(float(r["score"]), 5))
                    for r in s.scored(q).collect()}
        assert fast == walk, q
        assert packed == fast, q
