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
    """(num_matches, sloppy_freq) of the phrase in one document.

    `terms[i]` is the phrase's i-th slot; `positions[t]` the doc positions
    of term t (sorted).  freq contribution per match is 1/(distance+1)
    (BM25Similarity.computeSlopFactor, BM25Similarity.java:246)."""
    if any(t not in positions or not positions[t] for t in terms):
        return 0, 0.0
    pps = [_PP(i, i, positions[t]) for i, t in enumerate(terms)]

    # ----- init (initFirstTime / initComplex, single-term slots) -----
    for pp in pps:
        pp.next_position()  # placeFirstPositions
    # repetition groups = slots sharing a term (for single-term slots the
    # same-first-tpPos criterion of gatherRptGroups reduces to term equality)
    by_term: dict[str, list[_PP]] = {}
    for pp, t in zip(pps, terms):
        by_term.setdefault(t, []).append(pp)
    rpt_groups: list[list[_PP]] = []
    for t, group in by_term.items():
        if len(group) > 1:
            group.sort(key=lambda p: p.offset)  # sortRptGroups
            for j, pp in enumerate(group):
                pp.rpt_group = len(rpt_groups)
                pp.rpt_ind = j
            rpt_groups.append(group)
    has_rpts = bool(rpt_groups)
    # advanceRepeatGroups (no multi-term): advance rg[j] j times
    for rg in rpt_groups:
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
