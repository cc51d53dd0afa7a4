"""Property tests: the vectorized numpy interval kernels must agree with the
golden-pinned lazy iterator kernel (intervals.kernel) on random inputs.

The iterator kernel is the semantic ground truth (transcribed from the
reference's intervals package, 9/11 golden suites); vectorized.py is a
performance re-expression — any divergence is a bug in vectorized.py."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_intervals_spark.intervals import kernel as IK
from lucene_solr_intervals_spark.intervals import vectorized as VK
from lucene_solr_intervals_spark.search import queries as Q

rng = np.random.RandomState(1234)


def _random_docs(n_docs: int, max_len: int = 40, p_term: float = 0.25):
    """Per-doc position dicts for two terms 'a' and 'b' (disjoint positions,
    like a real token stream where each position holds one token)."""
    docs = []
    for _ in range(n_docs):
        doclen = rng.randint(2, max_len)
        owner = rng.rand(doclen)
        pos_a = [p for p in range(doclen) if owner[p] < p_term]
        pos_b = [p for p in range(doclen) if p_term <= owner[p] < 2 * p_term]
        docs.append({"a": pos_a, "b": pos_b})
    return docs


def _keys(docs, term, stride):
    out = []
    for di, pos in enumerate(docs):
        for p in pos.get(term, []):
            out.append(di * stride + p)
    return np.array(out, dtype=np.int64)


def _stride(docs):
    mx = max((max(max(p["a"], default=0), max(p["b"], default=0)) for p in docs), default=0)
    return mx + 4


@pytest.mark.parametrize("slop", [0, 1, 3, 7])
def test_ordered_near_2_matches_iterator(slop):
    docs = _random_docs(300)
    stride = _stride(docs)
    q = Q.OrderedNear(slop, (Q.Term("a"), Q.Term("b")))
    expect = sorted(
        di for di, pos in enumerate(docs) if IK.build_iter(q, pos) is not None
    )
    got = VK.ordered_near_2(
        _keys(docs, "a", stride), _keys(docs, "b", stride), slop, stride
    ).tolist()
    assert got == expect
    # the k-term kernel must agree on k == 2
    got_k = VK.ordered_near_k(
        [_keys(docs, "a", stride), _keys(docs, "b", stride)], slop, stride
    ).tolist()
    assert got_k == expect


@pytest.mark.parametrize("slop", [0, 1, 3, 7])
def test_unordered_near_2_matches_iterator(slop):
    docs = _random_docs(300)
    stride = _stride(docs)
    q = Q.UnorderedNear(slop, (Q.Term("a"), Q.Term("b")))
    expect = sorted(
        di for di, pos in enumerate(docs) if IK.build_iter(q, pos) is not None
    )
    # build_iter applies the n-2 adjustment internally; for n == 2 it is slop
    got = VK.unordered_near_2(
        _keys(docs, "a", stride), _keys(docs, "b", stride), slop, stride
    ).tolist()
    assert got == expect


@pytest.mark.parametrize("slop", [1, 2, 4, 8])
def test_sloppy_pairs_2_matches_iterator(slop):
    docs = _random_docs(300)
    stride = _stride(docs)
    q = Q.Phrase(("a", "b"), slop=slop, scorer="intervals")
    exp_docs, exp_cnt, exp_sf = [], [], []
    for di, pos in enumerate(docs):
        it = IK.build_iter(q, pos)
        if it is None:
            continue
        items = it.items if isinstance(it, IK.ReplayIter) else IK._materialize(it)
        if not items:
            continue
        exp_docs.append(di)
        exp_cnt.append(len(items))
        exp_sf.append(sum(1.0 / (d + 1) if d >= 0 else 1.0 for _, d in items))
    g_docs, g_cnt, g_sf = VK.sloppy_pairs_2(
        _keys(docs, "a", stride), _keys(docs, "b", stride), slop, stride
    )
    assert g_docs.tolist() == exp_docs
    assert g_cnt.tolist() == exp_cnt
    np.testing.assert_allclose(g_sf, exp_sf, rtol=1e-12)


@pytest.mark.parametrize("terms", [("a", "b"), ("a", "b", "a"), ("b", "a", "b", "a")])
def test_exact_phrase_matches_iterator(terms):
    docs = _random_docs(300, p_term=0.35)
    stride = _stride(docs)
    q = Q.Phrase(tuple(terms))
    exp_docs, exp_cnt = [], []
    for di, pos in enumerate(docs):
        it = IK.build_iter(q, pos)
        if it is None:
            continue
        items = it.items if isinstance(it, IK.ReplayIter) else IK._materialize(it)
        if not items:
            continue
        exp_docs.append(di)
        exp_cnt.append(len(items))
    slot_keys = [_keys(docs, t, stride) for t in terms]
    starts = VK.exact_phrase(slot_keys)
    g_docs, g_cnt = np.unique(starts // stride, return_counts=True)
    assert g_docs.tolist() == exp_docs
    assert g_cnt.tolist() == exp_cnt


def _random_docs_k(n_docs: int, terms: list[str], max_len: int = 50):
    docs = []
    for _ in range(n_docs):
        doclen = rng.randint(3, max_len)
        owner = rng.randint(0, len(terms) + 2, size=doclen)  # +2 = filler
        pos = {t: [] for t in terms}
        for p in range(doclen):
            if owner[p] < len(terms):
                pos[terms[owner[p]]].append(p)
        docs.append(pos)
    return docs


@pytest.mark.parametrize("k,slop", [(3, 0), (3, 2), (3, 6), (4, 3), (4, 10), (5, 8)])
def test_ordered_near_k_matches_iterator(k, slop):
    terms = [chr(ord("a") + i) for i in range(k)]
    docs = _random_docs_k(250, terms)
    stride = max(
        (max((max(p, default=0) for p in d.values()), default=0) for d in docs),
        default=0,
    ) + k + 2
    q = Q.OrderedNear(slop, tuple(Q.Term(t) for t in terms))
    expect = sorted(
        di for di, pos in enumerate(docs) if IK.build_iter(q, pos) is not None
    )
    keys = []
    for t in terms:
        arr = []
        for di, pos in enumerate(docs):
            arr.extend(di * stride + p for p in pos.get(t, []))
        keys.append(np.array(arr, dtype=np.int64))
    got = VK.ordered_near_k(keys, slop, stride).tolist()
    assert got == expect


def test_fast_shape_dispatch():
    assert VK.fast_shape(Q.Phrase(("x", "y"))) == ("phrase", ("x", "y"))
    assert VK.fast_shape(Q.Phrase(("x", "y"), slop=2, scorer="intervals")) == (
        "sloppy2", "x", "y", 2,
    )
    # classic-scorer sloppy phrase takes the VECTORIZED SloppyPhraseScorer
    # walk when no repeats (r6: classic_sloppy_2)
    assert VK.fast_shape(Q.Phrase(("x", "y"), slop=2)) == ("csloppy2", "x", "y", 2)
    assert VK.fast_shape(
        Q.Phrase(("x", "x"), slop=2, scorer="intervals")
    ) is None  # repeated term
    assert VK.fast_shape(Q.OrderedNear(3, (Q.Term("x"), Q.Term("y")))) == (
        "orderedk", ("x", "y"), 3,
    )
    assert VK.fast_shape(
        Q.OrderedNear(3, (Q.Term("x"), Q.Term("y"), Q.Term("z")))
    ) == ("orderedk", ("x", "y", "z"), 3)
    assert VK.fast_shape(Q.UnorderedNear(2, (Q.Term("x"), Q.Term("y")))) == (
        "unordered2", "x", "y", 2,
    )
    # nested / 3-way trees stay on the iterator path
    assert VK.fast_shape(Q.OrderedNear(3, (Q.Term("x"), Q.Phrase(("y", "z"))))) is None
    assert (
        VK.fast_shape(Q.UnorderedNear(1, (Q.Term("x"), Q.Term("y"), Q.Term("z")))) is None
    )


def test_ordered_near_k_repeated_term():
    """Repeated term operands: the chain needs distinct increasing positions
    of the same term (searchsorted is strict) — matches the iterator."""
    for slop in (0, 2, 5):
        docs = _random_docs(200, p_term=0.35)
        stride = _stride(docs)
        q = Q.OrderedNear(slop, (Q.Term("a"), Q.Term("a"), Q.Term("b")))
        expect = sorted(
            di for di, pos in enumerate(docs) if IK.build_iter(q, pos) is not None
        )
        ka = _keys(docs, "a", stride)
        kb = _keys(docs, "b", stride)
        got = VK.ordered_near_k([ka, ka, kb], slop, stride).tolist()
        assert got == expect, slop
