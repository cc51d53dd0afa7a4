"""Vectorized (numpy) interval kernels for the dominant positional shapes.

The lazy per-doc iterators in ``intervals.kernel`` are the semantic ground
truth (transcribed from the reference's intervals package and pinned by the
golden tables), but running them doc-at-a-time in Python is the slowest part
of the engine — at 100x corpus scale they dominate every positional query.
This module re-expresses the three shapes that cover ~all real queries as
whole-batch numpy array programs; the iterator path remains the fallback for
arbitrary nested trees.  Property tests (tests/test_vectorized_kernels.py)
assert batch-for-batch equality with the iterator kernel on random inputs.

Encoding: every (doc, position) pair becomes one int64 key
``doc * stride + pos`` with ``stride > max_position + phrase_len``; keys of
one term across a whole batch form a single sorted array, so doc boundaries
never need per-doc slicing.

Shapes and their reference semantics:

  exact_phrase     ExactPhraseScorer.java:30 — term_i at p+i; count = number
                   of start positions (handles repeated terms).
  ordered_near_2   OrderedConjunctionIntervalIterator.java:77-113 wrapped in
                   WithinOrderedFilter (OrderedNearQuery.java:44-47): for two
                   term streams the minimal-interval antichain is, for each
                   b, the nearest a < b; a doc matches iff min (b - a - 1)
                   <= slop.  freq() == 1 (IntervalFilterQuery.java:375-377),
                   so existence is all scoring needs.
  unordered_near_2 ConjunctionIntervalIterator.java:95-119 + WithinFilter
                   with adjusted slop (UnorderedNearQuery.java:46): a doc
                   matches iff the nearest opposite-term neighbor gap
                   |a - b| - 1 <= slop.
  sloppy_pairs_2   sloppy PhraseQuery via the unordered conjunction: the
                   minimal intervals of a two-distinct-term conjunction are
                   exactly the consecutive opposite-type neighbor pairs in
                   the merged position stream; sloppyFreq = sum over
                   surviving pairs of 1/(matchDistance+1)
                   (BM25Similarity.sloppyFreq:70-72).
"""

from __future__ import annotations

import numpy as np

from ..search import queries as Q

_EMPTY = np.empty(0, dtype=np.int64)


def encode(doc: np.ndarray, pos: np.ndarray, stride: int) -> np.ndarray:
    return doc * np.int64(stride) + pos


def exact_phrase(slot_keys: list[np.ndarray]) -> np.ndarray:
    """Encoded start keys of every exact phrase match: slot i's term must
    occur at start+i.  Set intersection over shifted key sets — repeated
    terms fall out naturally (same key array used for several slots)."""
    starts = slot_keys[0]
    for i, keys in enumerate(slot_keys[1:], start=1):
        if starts.size == 0:
            return _EMPTY
        starts = starts[np.isin(starts, keys - i, assume_unique=True)]
    return starts


def gapped_phrase(slot_keys: list[np.ndarray], offsets: list[int]) -> np.ndarray:
    """exact_phrase with explicit per-slot position offsets — the rewritten
    NGramPhraseQuery shape (slot j's term at start + offsets[j])."""
    starts = slot_keys[0] - np.int64(offsets[0])
    for keys, off in zip(slot_keys[1:], offsets[1:]):
        if starts.size == 0:
            return _EMPTY
        starts = starts[np.isin(starts, keys - np.int64(off), assume_unique=True)]
    return starts


def ordered_near_2(
    akeys: np.ndarray, bkeys: np.ndarray, slop: int, stride: int
) -> np.ndarray:
    """Docs (decoded ids) with >=1 minimal ordered interval a < b whose
    match distance (b - 1 - a) <= slop."""
    if akeys.size == 0 or bkeys.size == 0:
        return _EMPTY
    idx = np.searchsorted(akeys, bkeys, side="left")
    has_prev = idx > 0
    prev = akeys[np.maximum(idx - 1, 0)]
    same_doc = (prev // stride) == (bkeys // stride)
    gap = bkeys - prev
    sel = has_prev & same_doc & (gap - 1 <= slop)
    return np.unique(bkeys[sel] // stride)


def ordered_near_k(
    term_keys: list[np.ndarray], slop: int, stride: int
) -> np.ndarray:
    """Docs with >=1 ordered chain t1 < t2 < ... < tk whose match distance
    (tk - (k-1) - t1) <= slop — the k-term generalization, k-1 chained
    searchsorted passes.

    Invariant: after stage i, `cur` holds term-i positions that END a valid
    chain, and `begins[j]` is the LATEST possible chain start ending at
    cur[j].  begins is nondecreasing along cur within a doc (inductively:
    stage 1 trivially; stage i+1 takes begins[latest valid predecessor],
    and a later q has a later-or-equal latest predecessor), so the latest
    predecessor always carries the maximal begin — exactly the minimal-
    interval antichain of OrderedConjunctionIntervalIterator over term
    operands.  Existence under WithinOrderedFilter(slop) follows from the
    per-end minimal distance (tk - (k-1)) - begin."""
    if any(k.size == 0 for k in term_keys):
        return _EMPTY
    cur = term_keys[0]
    begins = cur
    for nxt in term_keys[1:]:
        idx = np.searchsorted(cur, nxt, side="left")
        has_prev = idx > 0
        prev_i = np.maximum(idx - 1, 0)
        same_doc = (cur[prev_i] // stride) == (nxt // stride)
        ok = has_prev & same_doc
        if not ok.any():
            return _EMPTY
        begins = begins[prev_i[ok]]
        cur = nxt[ok]
    k = len(term_keys)
    dist = (cur - (k - 1)) - begins
    return np.unique(cur[dist <= slop] // stride)


def unordered_near_2(
    akeys: np.ndarray, bkeys: np.ndarray, slop: int, stride: int
) -> np.ndarray:
    """Docs with >=1 unordered pair |a - b| - 1 <= slop (slop already
    adjusted by the caller per UnorderedNearQuery.java:46)."""
    if akeys.size == 0 or bkeys.size == 0:
        return _EMPTY
    bdoc = bkeys // stride
    idx = np.searchsorted(akeys, bkeys, side="left")
    out = []
    has_prev = idx > 0
    prev = akeys[np.maximum(idx - 1, 0)]
    sel_l = has_prev & ((prev // stride) == bdoc) & (bkeys - prev - 1 <= slop)
    out.append(bdoc[sel_l])
    has_next = idx < akeys.size
    nxt = akeys[np.minimum(idx, akeys.size - 1)]
    sel_r = has_next & ((nxt // stride) == bdoc) & (nxt - bkeys - 1 <= slop)
    out.append(bdoc[sel_r])
    return np.unique(np.concatenate(out))


def sloppy_pairs_2(
    akeys: np.ndarray, bkeys: np.ndarray, slop: int, stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Two-distinct-term sloppy phrase: (docs, n_intervals, sloppy_freq).

    Minimal intervals of the 2-term unordered conjunction == consecutive
    opposite-type neighbors in the merged sorted position stream (any wider
    pair strictly contains one of these).  Survivors: matchDistance
    (gap - 1) <= slop.
    """
    if akeys.size == 0 or bkeys.size == 0:
        return _EMPTY, _EMPTY, np.empty(0, dtype=np.float64)
    keys = np.concatenate([akeys, bkeys])
    typ = np.concatenate(
        [np.zeros(akeys.size, dtype=np.int8), np.ones(bkeys.size, dtype=np.int8)]
    )
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    t = typ[order]
    if k.size < 2:
        return _EMPTY, _EMPTY, np.empty(0, dtype=np.float64)
    same_doc = (k[1:] // stride) == (k[:-1] // stride)
    diff_type = t[1:] != t[:-1]
    gap = k[1:] - k[:-1]
    sel = same_doc & diff_type & (gap - 1 <= slop)
    docs_all = k[1:][sel] // stride
    dist = (gap[sel] - 1).astype(np.float64)
    if docs_all.size == 0:
        return _EMPTY, _EMPTY, np.empty(0, dtype=np.float64)
    uniq, inv = np.unique(docs_all, return_inverse=True)
    cnt = np.bincount(inv, minlength=uniq.size).astype(np.int64)
    contrib = np.where(dist >= 0.0, 1.0 / (dist + 1.0), 1.0)
    sf = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(sf, inv, contrib)
    return uniq, cnt, sf


def classic_sloppy_2(
    akeys: np.ndarray, bkeys: np.ndarray, slop: int, stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SloppyPhraseScorer walk for a TWO-distinct-term phrase, vectorized
    across docs (the no-repeats fast path the per-doc Python walk in
    search/sloppy.py otherwise runs at interpreter speed).

    akeys/bkeys are offset-ADJUSTED keys: doc*stride + (pos - offset + C)
    with a constant C >= max offset so adjusted positions stay >= 0.

    Why this is the same walk (SloppyPhraseScorer.java:117-147): with two
    PhrasePositions, `end` (the running max) always equals the stationary
    pointer's position, so the walk is a sequence of consumption SEGMENTS —
    the advancing (minimum) pointer consumes its positions while <= next
    (ties consumed: the crossing test is strictly `>`), the final
    matchLength is next - (largest advancing position <= next), one match
    is scored per segment (matchLength <= slop), and the roles swap with
    next = the position that crossed.  Exhaustion ends the walk after the
    current segment's score — identical to the loop-exit count.  Each
    segment is one numpy step over all still-active docs: per-doc cost is
    O(#role-swaps) vector ops, not O(#positions) interpreted ops.
    Equality with the transcribed walk is pinned by property tests and the
    TestSloppyPhraseQuery goldens (tests/test_classic_sloppy_vectorized.py).

    Returns (docs, n_matches, sloppy_freq) for docs with >= 1 match.
    """
    empty = _EMPTY, _EMPTY, np.empty(0, dtype=np.float64)
    if akeys.size == 0 or bkeys.size == 0:
        return empty
    adocs = akeys // stride
    bdocs = bkeys // stride
    docs = np.intersect1d(adocs[np.concatenate([[True], adocs[1:] != adocs[:-1]])],
                          bdocs[np.concatenate([[True], bdocs[1:] != bdocs[:-1]])])
    if docs.size == 0:
        return empty
    a_lo = np.searchsorted(akeys, docs * stride, side="left")
    a_hi = np.searchsorted(akeys, (docs + 1) * stride, side="left")
    b_lo = np.searchsorted(bkeys, docs * stride, side="left")
    b_hi = np.searchsorted(bkeys, (docs + 1) * stride, side="left")

    n = docs.size
    ia = a_lo.copy()
    ib = b_lo.copy()
    va = akeys[ia]
    vb = bkeys[ib]
    # initial advancing pp = lesser by (position, offset); term0 has the
    # smaller offset, so it wins position ties
    adv_is_a = va <= vb
    nxt = np.where(adv_is_a, vb, va)
    n_match = np.zeros(n, dtype=np.int64)
    freq = np.zeros(n, dtype=np.float64)
    active = np.ones(n, dtype=bool)
    while active.any():
        ai = np.flatnonzero(active)
        adv_a = adv_is_a[ai]
        ml = np.empty(ai.size, dtype=np.int64)
        nxt_i = np.empty(ai.size, dtype=np.int64)
        exhausted = np.empty(ai.size, dtype=bool)
        for is_a, keys, hi in ((True, akeys, a_hi), (False, bkeys, b_hi)):
            m = adv_a == is_a
            if not m.any():
                continue
            rows = ai[m]
            # largest advancing position <= next (ties consumed)
            pred = np.searchsorted(keys, nxt[rows], side="right") - 1
            ml[m] = nxt[rows] - keys[pred]
            nxt_i[m] = pred + 1
            exhausted[m] = pred + 1 >= hi[rows]
        hit = ml <= slop
        np.add.at(n_match, ai[hit], 1)
        np.add.at(freq, ai[hit], 1.0 / (ml[hit] + 1.0))
        cont = ~exhausted
        rows = ai[cont]
        if rows.size:
            # crossing: old advancing pointer lands past next and becomes
            # stationary; the other pointer (at old next) advances
            ni = nxt_i[cont]
            # both np.where branches evaluate: clip the other list's index
            new_next = np.where(
                adv_a[cont],
                akeys[np.minimum(ni, akeys.size - 1)],
                bkeys[np.minimum(ni, bkeys.size - 1)],
            )
            ia[rows] = np.where(adv_a[cont], nxt_i[cont], ia[rows])
            ib[rows] = np.where(adv_a[cont], ib[rows], nxt_i[cont])
            nxt[rows] = new_next
            adv_is_a[rows] = ~adv_a[cont]
        active[ai[exhausted]] = False
    sel = n_match > 0
    return docs[sel], n_match[sel], freq[sel]


def classic_sloppy_k(
    keys_list: list, slop: int, stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SloppyPhraseScorer walk for a K-DISTINCT-term phrase, vectorized
    across docs (generalizes classic_sloppy_2's segment trick; repeats
    still take the per-doc transcription in search/sloppy.py because
    collision groups serialize the walk).

    keys_list[j] is slot j's offset-ADJUSTED sorted key array:
    doc*stride + (pos - offset_j + C), C = max offset.

    Same walk as SloppyPhraseScorer.java:117-147 phraseFreq with k
    PhrasePositions: the popped minimum pp consumes its positions while
    <= next (the queue top, ties consumed — the crossing test is strictly
    `>`); during that run `end` (the global max) cannot change because
    every consumed position <= next <= end, so the tracked minimum
    matchLength is end - (largest consumed position <= next) and exactly
    one match is scored per segment.  On the cross, end absorbs the
    crossing position (advancePP's `if (pp.position > end)`), the crossing
    pointer re-enters the queue, and the new pp/next re-derive as the two
    smallest current positions (ties broken by offset == slot order, the
    PhraseQueue key).  Exhaustion of the advancing pointer ends the walk
    after the current segment's score.  Each segment is one numpy step
    over all still-active docs, grouped by which slot is advancing.
    Equality with the transcribed walk is property-pinned in
    tests/test_classic_sloppy_vectorized.py.

    Returns (docs, n_matches, sloppy_freq) for docs with >= 1 match.
    """
    k = len(keys_list)
    empty = _EMPTY, _EMPTY, np.empty(0, dtype=np.float64)
    if any(ks.size == 0 for ks in keys_list):
        return empty
    docs = None
    for ks in keys_list:
        d = ks // stride
        d = d[np.concatenate([[True], d[1:] != d[:-1]])]
        docs = d if docs is None else np.intersect1d(docs, d)
    if docs.size == 0:
        return empty
    n = docs.size
    SENT = np.iinfo(np.int64).max
    hi = np.empty((k, n), dtype=np.int64)
    V = np.empty((k, n), dtype=np.int64)  # current key per slot (doc-based)
    for t, ks in enumerate(keys_list):
        lo_t = np.searchsorted(ks, docs * stride, side="left")
        hi[t] = np.searchsorted(ks, (docs + 1) * stride, side="left")
        V[t] = ks[lo_t]
    cur = np.argmin(V, axis=0)  # first occurrence == smallest offset on ties
    end = V.max(axis=0)
    Vm = V.copy()
    Vm[cur, np.arange(n)] = SENT
    nxt = Vm.min(axis=0)
    n_match = np.zeros(n, dtype=np.int64)
    freq = np.zeros(n, dtype=np.float64)
    active = np.ones(n, dtype=bool)
    while active.any():
        ai = np.flatnonzero(active)
        cai = cur[ai]
        ml = np.empty(ai.size, dtype=np.int64)
        nxt_i = np.empty(ai.size, dtype=np.int64)
        exhausted = np.empty(ai.size, dtype=bool)
        for t in range(k):
            m = cai == t
            if not m.any():
                continue
            rows = ai[m]
            ks = keys_list[t]
            # largest advancing position <= next (ties consumed); the
            # current position is itself <= next, so pred stays inside
            # this doc's range
            pred = np.searchsorted(ks, nxt[rows], side="right") - 1
            ml[m] = end[rows] - ks[pred]
            nxt_i[m] = pred + 1
            exhausted[m] = pred + 1 >= hi[t, rows]
        hit = ml <= slop
        np.add.at(n_match, ai[hit], 1)
        np.add.at(freq, ai[hit], 1.0 / (ml[hit] + 1.0))
        cont = ~exhausted
        rows = ai[cont]
        if rows.size:
            tsel = cai[cont]
            ni = nxt_i[cont]
            newv = np.empty(rows.size, dtype=np.int64)
            for t in range(k):
                m2 = tsel == t
                if m2.any():
                    ks = keys_list[t]
                    newv[m2] = ks[np.minimum(ni[m2], ks.size - 1)]
            V[tsel, rows] = newv
            end[rows] = np.maximum(end[rows], newv)
            Vr = V[:, rows]
            newcur = np.argmin(Vr, axis=0)
            cur[rows] = newcur
            Vm = Vr.copy()
            Vm[newcur, np.arange(rows.size)] = SENT
            nxt[rows] = Vm.min(axis=0)
        active[ai[exhausted]] = False
    sel = n_match > 0
    return docs[sel], n_match[sel], freq[sel]


def classic_sloppy_rpt(
    term_keys: dict[str, np.ndarray],
    terms: tuple[str, ...],
    slop: int,
    stride: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """SloppyPhraseScorer walk for a phrase with REPEATED terms (singleton
    slots), vectorized across docs in lockstep — the last serializing case
    of the classic walk (csloppy2 covered 2 distinct, csloppyk covered k
    distinct; repeats previously took the per-doc Python transcription in
    search/sloppy.py because collision groups serialize the walk).

    Key observations that make repeats vectorizable:

    * Two PhrasePositions of the same repeated term iterate the SAME
      occurrence list (offsets differ), so a collision
      (SloppyPhraseScorer.collide — equal tpPos) is exactly "equal
      occurrence INDEX", an int compare, never a position decode.
    * At a collision both pps sit at the same tpPos, so
      ``lesser`` (by position = tpPos - offset, then offset) is always the
      LARGER-offset member — the cascade target is branch-free.
    * advanceRpts' re-heapify is subsumed by recomputing argmin over the
      (position, offset) composite at the next pop, and phraseFreq's
      ``next`` is intentionally kept STALE across the cascade exactly like
      the reference (captured at pop time).

    Unlike csloppy2/csloppyk there is no segment trick (a collision can
    strike mid-segment), so the walk advances ONE position per lockstep
    step — per-doc cost is O(#positions) numpy-batch steps shared across
    the whole batch instead of O(#positions) interpreted steps per doc.

    term_keys are RAW (doc*stride + pos) arrays — offsets are applied
    internally (positions may go negative; the composite key handles it).
    Init follows initSimple (SloppyPhraseScorer.java:256-283): group
    member j starts j occurrences in; a doc whose tf(t) < multiplicity(t)
    can never place the group and scores 0.  Equality with the transcribed
    walk is property-pinned in tests/test_classic_sloppy_vectorized.py.

    Returns (docs, n_matches, sloppy_freq) for docs with >= 1 match.
    """
    k = len(terms)
    empty = _EMPTY, _EMPTY, np.empty(0, dtype=np.float64)
    uterms = sorted(set(terms))
    arrs = {t: term_keys.get(t, _EMPTY) for t in uterms}
    if any(a.size == 0 for a in arrs.values()):
        return empty
    mult = {t: terms.count(t) for t in uterms}
    docs = None
    for t in uterms:
        d = arrs[t] // stride
        uniq, counts = np.unique(d, return_counts=True)
        dd = uniq[counts >= mult[t]]
        docs = dd if docs is None else np.intersect1d(docs, dd)
        if docs.size == 0:
            return empty
    n = docs.size
    base = docs * stride
    SENT = np.iinfo(np.int64).max
    # per-slot occurrence cursors (absolute indices into the term's array)
    slots_of = {t: [j for j, x in enumerate(terms) if x == t] for t in uterms}
    idx = np.empty((k, n), dtype=np.int64)
    HI = np.empty((k, n), dtype=np.int64)
    for t in uterms:
        lo_t = np.searchsorted(arrs[t], base, side="left")
        hi_t = np.searchsorted(arrs[t], base + stride, side="left")
        for r, j in enumerate(slots_of[t]):
            idx[j] = lo_t + r  # initSimple: member r advances r times
            HI[j] = hi_t
    offs = np.arange(k, dtype=np.int64).reshape(k, 1)
    P = np.empty((k, n), dtype=np.int64)
    for j, t in enumerate(terms):
        P[j] = arrs[t][idx[j]] - base - j
    end = P.max(axis=0)
    rpt_slot = np.array([mult[t] > 1 for t in terms])

    rng_n = np.arange(n)
    comp = P * k + offs
    cur = np.argmin(comp, axis=0)  # pop: (position, offset) min
    tmp = comp.copy()
    tmp[cur, rng_n] = SENT
    nxt = P[np.argmin(tmp, axis=0), rng_n]  # queue top's position
    ml = end - P[cur, rng_n]
    n_match = np.zeros(n, dtype=np.int64)
    freq = np.zeros(n, dtype=np.float64)
    active = np.ones(n, dtype=bool)

    def _final(rows: np.ndarray) -> None:
        """loop exit (exhaustion anywhere): score the pending match."""
        if rows.size:
            h = ml[rows] <= slop
            hr = rows[h]
            n_match[hr] += 1
            freq[hr] += 1.0 / (ml[hr] + 1.0)
            active[rows] = False

    def _advance(slots: np.ndarray, rows: np.ndarray) -> np.ndarray:
        """advancePP for (slot, doc) pairs: bump cursor, refresh P and end;
        returns the surviving (non-exhausted) selector into rows."""
        newidx = idx[slots, rows] + 1
        exh = newidx >= HI[slots, rows]
        _final(rows[exh])
        keep = ~exh
        rows_k, slots_k, newidx_k = rows[keep], slots[keep], newidx[keep]
        if rows_k.size:
            idx[slots_k, rows_k] = newidx_k
            for j in range(k):
                m = slots_k == j
                if m.any():
                    r2 = rows_k[m]
                    P[j, r2] = arrs[terms[j]][idx[j, r2]] - base[r2] - j
            end[rows_k] = np.maximum(end[rows_k], P[slots_k, rows_k])
        return keep

    while active.any():
        ai = np.flatnonzero(active)
        cs = cur[ai]
        keep = _advance(cs, ai)
        ai, cs = ai[keep], cs[keep]
        if ai.size == 0:
            continue
        # advanceRpts cascade for docs whose advanced pp is in a repeat group
        cm = rpt_slot[cs]
        crows, cptr = ai[cm], cs[cm]
        while crows.size:
            coll = np.full(crows.size, -1, dtype=np.int64)
            for j in range(k):
                if not rpt_slot[j]:
                    continue
                m = cptr == j
                if not m.any():
                    continue
                rows = crows[m]
                cj = np.full(rows.size, -1, dtype=np.int64)
                for s in slots_of[terms[j]]:  # ascending offset = rg order
                    if s == j:
                        continue
                    eq = (idx[s, rows] == idx[j, rows]) & (cj == -1)
                    cj[eq] = s
                coll[m] = cj
            has = coll >= 0
            if not has.any():
                break
            rows, a_, b_ = crows[has], cptr[has], coll[has]
            lesser = np.maximum(a_, b_)  # equal tpPos: larger offset is lesser
            keep = _advance(lesser, rows)
            crows, cptr = rows[keep], lesser[keep]
        # crossing test (pp may itself have advanced during the cascade)
        ai = ai[active[ai]]
        if ai.size == 0:
            continue
        ppos = P[cur[ai], ai]
        crossed = ppos > nxt[ai]
        xr = ai[crossed]
        if xr.size:
            h = ml[xr] <= slop
            hr = xr[h]
            n_match[hr] += 1
            freq[hr] += 1.0 / (ml[hr] + 1.0)
            compx = P[:, xr] * k + offs
            rngm = np.arange(xr.size)
            newcur = np.argmin(compx, axis=0)
            cur[xr] = newcur
            tmpx = compx.copy()
            tmpx[newcur, rngm] = SENT
            nxt[xr] = P[np.argmin(tmpx, axis=0), xr]
            ml[xr] = end[xr] - P[newcur, xr]
        nr = ai[~crossed]
        if nr.size:
            ml[nr] = np.minimum(ml[nr], end[nr] - P[cur[nr], nr])
    sel = n_match > 0
    return docs[sel], n_match[sel], freq[sel]


# --------------------------------------------------------------- dispatch


def fast_shape(q) -> tuple | None:
    """Return a vectorizable descriptor for `q`, or None -> iterator path.

      ("phrase", terms)            exact phrase, any length / repeats
      ("sloppy2", a, b, slop)      2-distinct-term sloppy phrase (intervals)
      ("csloppy2", a, b, slop)     2-distinct-term sloppy phrase (classic
                                   SloppyPhraseScorer walk, vectorized)
      ("ordered2", a, b, slop)     OrderedNear of two Terms
      ("unordered2", a, b, slop)   UnorderedNear of two Terms (adjusted)
    """
    if isinstance(q, Q.Phrase):
        if q.slop == 0 and len(q.terms) >= 1:
            return ("phrase", tuple(q.terms))
        if q.slop > 0 and len(q.terms) == 2 and q.terms[0] != q.terms[1]:
            # sloppy2 implements the INTERVALS-module semantics; a
            # classic-scorer phrase runs the vectorized SloppyPhraseScorer
            # walk (no repeats: 2 distinct terms can never collide)
            if getattr(q, "scorer", "classic") == "intervals":
                return ("sloppy2", q.terms[0], q.terms[1], q.slop)
            return ("csloppy2", q.terms[0], q.terms[1], q.slop)
        if (
            q.slop > 0
            and len(q.terms) > 2
            and len(set(q.terms)) == len(q.terms)
            and getattr(q, "scorer", "classic") == "classic"
        ):
            # k distinct terms never collide -> the repeat-free walk
            # vectorizes (classic_sloppy_k)
            return ("csloppyk", tuple(q.terms), q.slop)
        if (
            q.slop > 0
            and len(q.terms) >= 2
            and getattr(q, "scorer", "classic") == "classic"
        ):
            # repeated terms: lockstep walk with vectorized collision
            # cascades (classic_sloppy_rpt)
            return ("csloppyr", tuple(q.terms), q.slop)
        return None
    if isinstance(q, Q.MultiPhrase) and q.slop > 0:
        # singleton slots degenerate to the k-term phrase walk (distinct ->
        # csloppy2/csloppyk, repeated -> the collision-cascade walk)
        if all(len(s) == 1 for s in q.slots):
            terms = tuple(next(iter(s)) for s in q.slots)
            if len(set(terms)) == len(terms):
                if len(terms) == 2:
                    return ("csloppy2", terms[0], terms[1], q.slop)
                return ("csloppyk", terms, q.slop)
            return ("csloppyr", terms, q.slop)
        return None
    if isinstance(q, Q.NGramPhrase):
        return ("phrase_off", q.kept_slots(), len(q.terms))
    if isinstance(q, Q.OrderedNear) and len(q.subs) >= 2:
        if all(isinstance(s, Q.Term) for s in q.subs):
            return ("orderedk", tuple(s.term for s in q.subs), q.slop)
    if isinstance(q, Q.UnorderedNear) and len(q.subs) == 2:
        a, b = q.subs
        if isinstance(a, Q.Term) and isinstance(b, Q.Term) and a.term != b.term:
            # adjusted slop: slop + n - 2 == slop for n == 2
            return ("unordered2", a.term, b.term, q.slop)
    return None


def interval_shape(q) -> tuple | None:
    """fast_shape extended with the shapes whose minimal-interval ENDPOINTS
    (not just existence/counts) are extractable vectorized — the offsets /
    highlighting feed.  Adds ("term", t): every position is an interval.

    The Phrase `scorer` field governs SCORING only; interval collection
    (offsets, highlighting) is always the intervals module's semantics, so
    a classic-scorer sloppy phrase still takes the sloppy2 endpoint path."""
    if isinstance(q, Q.Term):
        return ("term", q.term)
    if (
        isinstance(q, Q.Phrase)
        and q.slop > 0
        and len(q.terms) == 2
        and q.terms[0] != q.terms[1]
    ):
        return ("sloppy2", q.terms[0], q.terms[1], q.slop)
    s = fast_shape(q)
    # classic-walk SCORING shapes have no endpoint extractor, and intervals
    # semantics differ from the walk anyway -> iterator fallback
    if s is not None and s[0] in ("csloppy2", "csloppyk", "csloppyr"):
        return None
    return s


def run_shape_intervals(
    shape: tuple, term_keys: dict[str, np.ndarray], stride: int
) -> tuple[np.ndarray, np.ndarray]:
    """(begin_keys, end_keys) of every surviving minimal interval of `shape`
    — the vectorized twin of kernel.match_intervals for the fast shapes,
    used by offsets extraction (one searchsorted per endpoint stream instead
    of a per-doc Python iterator tree).

    Shape semantics (each pinned by the golden cross-path tests):
      term      every position, begin == end (TermIntervalIterator).
      phrase    starts from exact_phrase; end = start + k - 1 (BlockIter).
      orderedk  per chain end, begin = LATEST valid chain start (the
                ordered_near_k invariant); the antichain keeps the FIRST end
                of each distinct begin (ends ascend, begins nondecrease, so
                later equal-begin intervals strictly contain the first);
                WithinOrderedFilter keeps dist = end-(k-1)-begin <= slop.
      sloppy2 / unordered2  consecutive opposite-type neighbors in the
                merged stream (the 2-term conjunction's minimal antichain),
                gap - 1 <= slop.
    """
    kind = shape[0]
    if kind == "term":
        keys = term_keys.get(shape[1], _EMPTY)
        return keys, keys
    if kind == "phrase":
        terms = shape[1]
        starts = exact_phrase([term_keys.get(t, _EMPTY) for t in terms])
        return starts, starts + np.int64(len(terms) - 1)
    if kind == "phrase_off":
        kept, total = shape[1], shape[2]
        starts = gapped_phrase(
            [term_keys.get(t, _EMPTY) for t, _ in kept], [off for _, off in kept]
        )
        return starts, starts + np.int64(total - 1)
    if kind == "orderedk":
        terms, slop = shape[1], shape[2]
        keys = [term_keys.get(t, _EMPTY) for t in terms]
        if any(k.size == 0 for k in keys):
            return _EMPTY, _EMPTY
        cur = keys[0]
        begins = cur
        for nxt in keys[1:]:
            idx = np.searchsorted(cur, nxt, side="left")
            has_prev = idx > 0
            prev_i = np.maximum(idx - 1, 0)
            same_doc = (cur[prev_i] // stride) == (nxt // stride)
            ok = has_prev & same_doc
            if not ok.any():
                return _EMPTY, _EMPTY
            begins = begins[prev_i[ok]]
            cur = nxt[ok]
        keep = np.concatenate([[True], begins[1:] != begins[:-1]])
        begins, cur = begins[keep], cur[keep]
        k = len(terms)
        sel = (cur - (k - 1)) - begins <= slop
        return begins[sel], cur[sel]
    a = term_keys.get(shape[1], _EMPTY)
    b = term_keys.get(shape[2], _EMPTY)
    slop = shape[3]
    if kind in ("sloppy2", "unordered2"):
        if a.size == 0 or b.size == 0:
            return _EMPTY, _EMPTY
        keys = np.concatenate([a, b])
        typ = np.concatenate(
            [np.zeros(a.size, dtype=np.int8), np.ones(b.size, dtype=np.int8)]
        )
        order = np.argsort(keys, kind="stable")
        ks = keys[order]
        t = typ[order]
        if ks.size < 2:
            return _EMPTY, _EMPTY
        same_doc = (ks[1:] // stride) == (ks[:-1] // stride)
        diff_type = t[1:] != t[:-1]
        gap = ks[1:] - ks[:-1]
        sel = same_doc & diff_type & (gap - 1 <= slop)
        return ks[:-1][sel], ks[1:][sel]
    raise ValueError(kind)  # pragma: no cover


def run_shape(
    shape: tuple, term_keys: dict[str, np.ndarray], stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Execute a fast_shape over encoded per-term key arrays.

    Returns (docs, n_intervals, sloppy_freq); docs are decoded (key//stride).
    For existence-only shapes n_intervals is 1 per doc (freq()==1 scoring).
    """
    kind = shape[0]
    if kind == "phrase":
        terms = shape[1]
        slots = [term_keys.get(t, _EMPTY) for t in terms]
        starts = exact_phrase(slots)
        docs, cnt = np.unique(starts // stride, return_counts=True)
        return docs, cnt.astype(np.int64), cnt.astype(np.float64)
    if kind == "phrase_off":
        kept = shape[1]
        starts = gapped_phrase(
            [term_keys.get(t, _EMPTY) for t, _ in kept], [off for _, off in kept]
        )
        docs, cnt = np.unique(starts // stride, return_counts=True)
        return docs, cnt.astype(np.int64), cnt.astype(np.float64)
    if kind == "orderedk":
        terms, slop = shape[1], shape[2]
        docs = ordered_near_k([term_keys.get(t, _EMPTY) for t in terms], slop, stride)
        ones = np.ones(docs.size, dtype=np.int64)
        return docs, ones, ones.astype(np.float64)
    if kind == "csloppyk":
        terms, slop = shape[1], shape[2]
        kk = len(terms)
        # slot j adjust = C - j with C = max offset = k-1 (csloppy2's +1/+0
        # generalized); executor stride reserves len(terms) + 2 slack
        keys = [
            term_keys.get(t, _EMPTY) + np.int64(kk - 1 - j)
            for j, t in enumerate(terms)
        ]
        return classic_sloppy_k(keys, slop, stride)
    if kind == "csloppyr":
        # repeated terms: RAW keys, offsets applied inside the kernel
        return classic_sloppy_rpt(term_keys, shape[1], shape[2], stride)
    a = term_keys.get(shape[1], _EMPTY)
    b = term_keys.get(shape[2], _EMPTY)
    slop = shape[3]
    if kind == "sloppy2":
        return sloppy_pairs_2(a, b, slop, stride)
    if kind == "csloppy2":
        # classic walk runs in offset-adjusted space (pos - offset + C,
        # C = 1 = max offset keeps positions nonnegative); term0 off 0 ->
        # +1, term1 off 1 -> +0.  Adjusted positions stay < stride (the
        # executor reserves len(terms) + 2 slack above maxpos).
        return classic_sloppy_2(a + np.int64(1), b, slop, stride)
    if kind == "unordered2":
        docs = unordered_near_2(a, b, slop, stride)
    else:  # pragma: no cover
        raise ValueError(kind)
    ones = np.ones(docs.size, dtype=np.int64)
    return docs, ones, ones.astype(np.float64)
