"""Property tests for the interval kernel vs brute-force enumerators.

Golden tables (test_intervals_golden) pin the exact emitted intervals; these
tests pin DOC-LEVEL match existence on random inputs, where brute force has
unambiguous semantics:

  OrderedNear(slop, t1..tk)  matches iff exist positions p1<p2<...<pk
      (pi a position of ti) with matchDistance = (pk - (k-1)) - p1 <= slop
  UnorderedNear(slop, t1..tk) matches iff exist positions (one per term,
      all distinct slots) whose span satisfies
      (max - min) - (k - 1) <= slop   [adjusted slop slop+k-2 over the
      conjunction distance rightExtremeBegin-currentTopEnd-1]
  Phrase(t1..tk)             matches iff exists p with ti at p+i for all i
"""

from __future__ import annotations

from itertools import product

from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_intervals_spark.intervals.kernel import build_iter
from lucene_solr_intervals_spark.search import queries as Q

TERMS = ["a", "b", "c"]


def random_doc(draw_list):
    pos: dict[str, list[int]] = {}
    for p, t in enumerate(draw_list):
        pos.setdefault(t, []).append(p)
    return pos


def bf_ordered(pos, terms, slop):
    lists = [pos.get(t) for t in terms]
    if any(not lst for lst in lists):
        return False
    k = len(terms)
    for combo in product(*lists):
        if all(combo[i] < combo[i + 1] for i in range(k - 1)):
            if (combo[-1] - (k - 1)) - combo[0] <= slop:
                return True
    return False


def bf_unordered(pos, terms, slop):
    lists = [pos.get(t) for t in terms]
    if any(not lst for lst in lists):
        return False
    k = len(terms)
    adjusted = slop + k - 2
    for combo in product(*lists):
        lo, hi = min(combo), max(combo)
        if hi - lo - 1 <= adjusted:
            return True
    return False


def bf_phrase(pos, terms):
    lists = [pos.get(t) for t in terms]
    if any(not lst for lst in lists):
        return False
    starts = set(lists[0])
    for i, lst in enumerate(lists[1:], start=1):
        starts &= {p - i for p in lst}
    return bool(starts)


doc_strategy = st.lists(st.sampled_from(TERMS + ["x", "y"]), min_size=0, max_size=14)


@given(doc=doc_strategy, slop=st.integers(0, 4), nterms=st.integers(2, 3))
@settings(max_examples=800)
def test_ordered_near_existence(doc, slop, nterms):
    pos = random_doc(doc)
    terms = TERMS[:nterms]
    q = Q.OrderedNear(slop, tuple(Q.Term(t) for t in terms))
    got = build_iter(q, pos) is not None
    want = bf_ordered(pos, terms, slop)
    assert got == want, (doc, slop, terms)


@given(doc=doc_strategy, slop=st.integers(0, 4), nterms=st.integers(2, 3))
@settings(max_examples=800)
def test_unordered_near_existence(doc, slop, nterms):
    pos = random_doc(doc)
    terms = TERMS[:nterms]
    q = Q.UnorderedNear(slop, tuple(Q.Term(t) for t in terms))
    got = build_iter(q, pos) is not None
    want = bf_unordered(pos, terms, slop)
    assert got == want, (doc, slop, terms)


@given(doc=doc_strategy, nterms=st.integers(2, 3))
@settings(max_examples=500)
def test_phrase_existence(doc, nterms):
    pos = random_doc(doc)
    terms = TERMS[:nterms]
    q = Q.Phrase(tuple(terms))
    got = build_iter(q, pos) is not None
    want = bf_phrase(pos, terms)
    assert got == want, (doc, terms)


@given(doc=doc_strategy)
@settings(max_examples=500)
def test_brouwerian_existence(doc):
    pos = random_doc(doc)
    # a-intervals not inside any exact "a b" phrase occurrence
    q = Q.NonOverlapping(Q.Term("a"), Q.Phrase(("a", "b")))
    it = build_iter(q, pos)
    got = it is not None
    a_pos = pos.get("a", [])
    phrase_starts = [p for p in a_pos if p + 1 in pos.get("b", [])]
    surviving = [
        p for p in a_pos if not any(s <= p <= s + 1 for s in phrase_starts)
    ]
    assert got == bool(surviving), (doc,)
