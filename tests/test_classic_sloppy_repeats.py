"""Vectorized SloppyPhraseScorer walk for phrases with REPEATED terms
(classic_sloppy_rpt) — the last per-doc-Python case of the classic walk.

Pins the lockstep collision-cascade kernel against the transcribed walk
(search/sloppy.py, itself pinned to SloppyPhraseScorer.java by the
LUCENE-3412 goldens): property-level over random position sets, and
end-to-end through both the exploded Searcher and the packed
SegmentSearcher.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_intervals_spark.intervals.vectorized import (
    classic_sloppy_rpt,
    fast_shape,
)
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.sloppy import sloppy_slots_freq

STRIDE = 256


def _walk(terms, positions, slop):
    return sloppy_slots_freq([frozenset((t,)) for t in terms], positions, slop)


def _kernel_multi(doc_positions, terms, slop):
    """doc_positions: {doc: {term: sorted positions}} -> {doc: (n, freq)}."""
    term_keys = {}
    for t in sorted(set(terms)):
        keys = []
        for d, pls in doc_positions.items():
            keys += [d * STRIDE + p for p in pls.get(t, [])]
        term_keys[t] = np.array(sorted(keys), dtype=np.int64)
    docs, nm, fr = classic_sloppy_rpt(term_keys, tuple(terms), slop, STRIDE)
    return {int(d): (int(n), round(float(f), 9)) for d, n, f in zip(docs, nm, fr)}


PATTERNS = [
    ("a", "a"),
    ("a", "a", "a"),
    ("a", "b", "a"),
    ("a", "a", "b"),
    ("b", "a", "a"),
    ("a", "b", "a", "b"),
    ("a", "b", "b", "a"),
    ("a", "b", "c", "a"),
    ("a", "a", "b", "b"),
]


@given(
    data=st.lists(
        st.tuples(
            st.lists(st.integers(0, 120), min_size=0, max_size=10, unique=True),
            st.lists(st.integers(0, 120), min_size=0, max_size=8, unique=True),
            st.lists(st.integers(0, 120), min_size=0, max_size=5, unique=True),
        ),
        min_size=1,
        max_size=6,
    ),
    pattern=st.sampled_from(PATTERNS),
    slop=st.integers(0, 14),
)
@settings(max_examples=500, deadline=None)
def test_kernel_equals_walk_property(data, pattern, slop):
    want = {}
    doc_positions = {}
    for d, (A, B, C) in enumerate(data):
        pls = {"a": sorted(A), "b": sorted(B), "c": sorted(C)}
        doc_positions[d] = pls
        if all(pls[t] for t in set(pattern)):
            n, f = _walk(pattern, pls, slop)
            if n:
                want[d] = (n, round(f, 9))
    assert _kernel_multi(doc_positions, pattern, slop) == want


def test_kernel_hand_cases():
    """Hand cases: init multi-occurrence placement, collision cascade after
    a crossing, tf < multiplicity, exhaustion mid-cascade."""
    cases = [
        # "a b a": the classic LUCENE-3412 shape
        (("a", "b", "a"), {"a": [0, 2], "b": [1]}, 2),
        (("a", "b", "a"), {"a": [0, 2], "b": [1]}, 0),
        (("a", "b", "a"), {"a": [0, 5, 9], "b": [3, 7]}, 4),
        # "a a": adjacent repeat needs two distinct occurrences
        (("a", "a"), {"a": [4, 5]}, 0),
        (("a", "a"), {"a": [4, 9]}, 3),
        (("a", "a"), {"a": [4]}, 9),  # tf < multiplicity: no match
        # interleaved repeats
        (("a", "b", "a", "b"), {"a": [0, 2, 8], "b": [1, 3, 9]}, 2),
        (("a", "b", "b", "a"), {"a": [0, 9, 11], "b": [2, 3, 5]}, 6),
    ]
    for terms, positions, slop in cases:
        n_w, f_w = _walk(terms, positions, slop)
        got = _kernel_multi({0: positions}, terms, slop)
        want = {0: (n_w, round(f_w, 9))} if n_w else {}
        assert got == want, (terms, positions, slop, got, (n_w, f_w))


DOCS = [
    (0, "table hash join table merge hash"),
    (1, "hash table"),
    (2, "table x y z hash table hash x table"),
    (3, "merge sort only"),
    (4, "hash hash hash table"),
    (5, "table y hash y table y y hash y y y table"),
    (6, "table table"),
    (7, "hash table hash table hash"),
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
    index_dir = str(tmp_path_factory.mktemp("csloppyr") / "idx")
    build_segments(corpus, index_dir, n_segments=2, id_col="doc_id",
                   text_col="text", analyzer="ws", n_docs_hint=len(DOCS))
    ss = SegmentSearcher(spark, index_dir)
    yield s, ss
    idx.unpersist()


def test_end_to_end_repeats_kernel_equals_forced_walk(searchers, monkeypatch):
    """Repeated-term classic sloppy phrases: vectorized kernel == forced
    per-doc walk, exploded AND packed paths."""
    import lucene_solr_intervals_spark.intervals.vectorized as VK

    s, ss = searchers
    queries = [
        Q.Phrase(("table", "hash", "table"), slop=sl) for sl in (1, 2, 4, 8)
    ] + [
        Q.Phrase(("hash", "hash"), slop=2),
        Q.Phrase(("table", "table"), slop=1),
        Q.Phrase(("hash", "table", "hash"), slop=3),
        Q.Phrase(("table", "y", "table", "y"), slop=6),
        Q.MultiPhrase((("table",), ("hash",), ("table",)), slop=4),
    ]
    for q in queries:
        assert VK.fast_shape(q)[0] == "csloppyr", q
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


def test_end_to_end_packed_k_distinct_now_vectorized(searchers, monkeypatch):
    """Round 9 also turned ON the csloppyk fast path in the PACKED searcher
    (it previously Python-walked there): equality with the forced walk."""
    import lucene_solr_intervals_spark.intervals.vectorized as VK

    s, ss = searchers
    q = Q.Phrase(("table", "hash", "join"), slop=5)
    assert VK.fast_shape(q)[0] == "csloppyk"
    fast = {(r["doc_id"], round(float(r["score"]), 5))
            for r in ss.search_intervals(q, k=20).collect()}
    with monkeypatch.context() as m:
        m.setattr(VK, "fast_shape", lambda _q: None)
        walk = {(r["doc_id"], round(float(r["score"]), 5))
                for r in ss.search_intervals(q, k=20).collect()}
    assert fast == walk
