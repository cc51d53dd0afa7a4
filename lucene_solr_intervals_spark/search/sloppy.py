"""SloppyPhraseScorer semantics, re-derived for the per-doc kernel.

The fork's PhraseQuery with slop > 0 scores with SloppyPhraseScorer
(PhraseQuery.java:296), NOT the interval iterators — and its repeated-term
handling (LUCENE-3412) differs from SloppyIntervalIterator: each phrase
slot must consume a DISTINCT occurrence, and the match walk always advances
the least PhrasePosition.  This module transcribes that algorithm
(SloppyPhraseScorer.java:117-147 phraseFreq, :150-200 advancePP/advanceRpts,
:256-283 initSimple/initComplex, :305-334 advanceRepeatGroups,
PhrasePositions.java:75 position = tp - offset,
PhraseQueue.java:28-44 order (position, offset, ord)) so repeated-term
phrase scoring is bit-compatible with the reference.

Single-term slots only (PhraseQuery of Terms); the multi-term-posting
variant (hasMultiTermRpts) belongs to MultiPhraseQuery, which this engine
executes through the interval kernel.
"""

from __future__ import annotations


class _PP:
    __slots__ = ("offset", "ord", "positions", "idx", "position", "rpt_group", "rpt_ind")

    def __init__(self, offset: int, ord_: int, positions: list[int]):
        self.offset = offset
        self.ord = ord_
        self.positions = positions  # sorted term positions in the doc
        self.idx = -1
        self.position = 0
        self.rpt_group = -1
        self.rpt_ind = -1

    def next_position(self) -> bool:
        """PhrasePositions.nextPosition: position = tp - offset."""
        self.idx += 1
        if self.idx >= len(self.positions):
            return False
        self.position = self.positions[self.idx] - self.offset
        return True

    def tp_pos(self) -> int:
        return self.position + self.offset

    def key(self):
        return (self.position, self.offset, self.ord)


def _lesser(a: _PP, b: _PP) -> _PP:
    """SloppyPhraseScorer.lesser: by (position, offset) only."""
    if a.position < b.position or (a.position == b.position and a.offset < b.offset):
        return a
    return b


def sloppy_phrase_freq(
    terms: tuple[str, ...], positions: dict[str, list[int]], slop: int
) -> tuple[int, float]:
    """(num_matches, sloppy_freq) of a single-term-slot phrase in one doc."""
    return sloppy_slots_freq(
        [frozenset((t,)) for t in terms], positions, slop
    )


def sloppy_slots_freq(
    slots: list[frozenset], positions: dict[str, list[int]], slop: int
) -> tuple[int, float]:
    """(num_matches, sloppy_freq) for a phrase whose slot i accepts any term
    of `slots[i]` — PhraseQuery (singleton slots) AND MultiPhraseQuery
    (multi-term slots score through the same SloppyPhraseScorer via
    UnionDocsAndPositionsEnum, MultiPhraseQuery.java:216).  Repeat handling
    covers both cases of the reference: plain repeats (advance j steps at
    init) and multi-term repeats (union-find term groups + collide-resolve
    init, SloppyPhraseScorer.java:305-334, :394-430).

    freq contribution per match is 1/(distance+1)
    (BM25Similarity.computeSlopFactor, BM25Similarity.java:246)."""
    slot_positions: list[list[int]] = []
    for s in slots:
        merged = sorted(
            p for t in s for p in positions.get(t, [])
        )
        if not merged:
            return 0, 0.0
        slot_positions.append(merged)
    pps = [_PP(i, i, ps) for i, ps in enumerate(slot_positions)]

    # ----- init (initFirstTime / initComplex) -----
    for pp in pps:
        pp.next_position()  # placeFirstPositions
    # repeatingTerms: terms appearing in >= 2 slots
    term_count: dict[str, int] = {}
    for s in slots:
        for t in s:
            term_count[t] = term_count.get(t, 0) + 1
    rpt_terms = {t for t, c in term_count.items() if c >= 2}
    has_multi_term_rpts = any(
        len(s) > 1 and (s & rpt_terms) for s in slots
    )
    rpt_groups: list[list[_PP]] = []
    if rpt_terms:
        if not has_multi_term_rpts:
            # simple: group slots by their (single) repeated term
            by_term: dict[str, list[_PP]] = {}
            for pp, s in zip(pps, slots):
                (t,) = tuple(s) if len(s) == 1 else (next(iter(s)),)
                if t in rpt_terms:
                    by_term.setdefault(t, []).append(pp)
            for t, group in by_term.items():
                if len(group) > 1:
                    group.sort(key=lambda p: p.offset)  # sortRptGroups
                    for j, pp in enumerate(group):
                        pp.rpt_group = len(rpt_groups)
                        pp.rpt_ind = j
                    rpt_groups.append(group)
        else:
            # connected regions on the slots/terms bipartite graph
            # (unionTermGroups / termGroups, SloppyPhraseScorer.java:447-478)
            parent = {t: t for t in rpt_terms}

            def find(t):
                while parent[t] != t:
                    parent[t] = parent[parent[t]]
                    t = parent[t]
                return t

            for s in slots:
                shared = sorted(s & rpt_terms)
                for a, b in zip(shared, shared[1:]):
                    parent[find(a)] = find(b)
            groups: dict[str, list[_PP]] = {}
            for pp, s in zip(pps, slots):
                roots = {find(t) for t in (s & rpt_terms)}
                for r in sorted(roots):
                    groups.setdefault(r, [])
                    if pp not in groups[r]:
                        groups[r].append(pp)
            for r in sorted(groups):
                rg = groups[r]
                if len(rg) > 1:
                    rg.sort(key=lambda p: p.offset)
                    for j, pp in enumerate(rg):
                        pp.rpt_group = len(rpt_groups)
                        pp.rpt_ind = j
                    rpt_groups.append(rg)
    has_rpts = bool(rpt_groups)

    def _collide_init(pp, rg):
        tp = pp.tp_pos()
        for other in rg:
            if other is not pp and other.tp_pos() == tp:
                return other
        return None

    # advanceRepeatGroups (:305-334).  Collision resolution must propagate
    # the MULTI-TERM pp, not the singleton — the contract pinned by
    # TestMultiPhraseQuery.java:161 testMultiSloppyWithRepeats ("this will
    # fail, when the scorer would propagate [a] rather than [a,b]"):
    # advancing the singleton exhausts it even though a valid combination
    # exists through the union pp's other term.
    multi = {id(pp): len(slots[pp.ord]) > 1 for pp in pps}
    for rg in rpt_groups:
        if has_multi_term_rpts:
            for i in range(len(rg)):
                pp = rg[i]
                while (other := _collide_init(pp, rg)) is not None:
                    a, b = pp, other
                    if multi[id(a)] != multi[id(b)]:
                        pp2 = a if multi[id(a)] else b
                    else:
                        pp2 = _lesser(a, b)
                    if not pp2.next_position():
                        return 0, 0.0
        else:
            for j in range(1, len(rg)):
                for _ in range(j):
                    if not rg[j].next_position():
                        return 0, 0.0

    # fillQueue: tiny n, a sorted list stands in for the heap
    queue = list(pps)
    queue.sort(key=_PP.key)
    end = max(pp.position for pp in pps)

    def collide(pp: _PP) -> int:
        tp = pp.tp_pos()
        for other in rpt_groups[pp.rpt_group]:
            if other is not pp and other.tp_pos() == tp:
                return other.rpt_ind
        return -1

    def advance_pp(pp: _PP) -> bool:
        nonlocal end
        if not pp.next_position():
            return False
        if pp.position > end:
            end = pp.position
        return True

    def advance_rpts(pp: _PP) -> bool:
        """Resolve the (single possible) repeater collision chain; the
        re-queue bookkeeping of the reference is subsumed by re-sorting."""
        if pp.rpt_group < 0:
            return True
        rg = rpt_groups[pp.rpt_group]
        while (k := collide(pp)) >= 0:
            pp = _lesser(pp, rg[k])
            if not advance_pp(pp):
                return False
        queue.sort(key=_PP.key)  # positions moved: restore heap order
        return True

    # ----- phraseFreq walk (SloppyPhraseScorer.java:117-147) -----
    n_matches = 0
    freq = 0.0
    pp = queue.pop(0)
    match_length = end - pp.position
    next_pos = queue[0].position
    while advance_pp(pp):
        if has_rpts and not advance_rpts(pp):
            break
        if pp.position > next_pos:  # done minimizing current match length
            if match_length <= slop:
                freq += 1.0 / (match_length + 1.0)
                n_matches += 1
            queue.append(pp)
            queue.sort(key=_PP.key)
            pp = queue.pop(0)
            next_pos = queue[0].position
            match_length = end - pp.position
        else:
            match_length2 = end - pp.position
            if match_length2 < match_length:
                match_length = match_length2
    if match_length <= slop:
        freq += 1.0 / (match_length + 1.0)
        n_matches += 1
    return n_matches, freq
