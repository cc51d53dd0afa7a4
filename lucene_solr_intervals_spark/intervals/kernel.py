"""Minimal-interval kernel: Vigna-style lazy iterators over per-doc positions.

Re-implements the semantics of the reference's
org.apache.lucene.search.intervals package (the fork's distinguishing
feature, LUCENE-2878) as per-document Python iterators intended to run
inside Arrow-batched pandas UDFs.  Semantics verified against the golden
tables transcribed in FIXTURES.md from the reference's own tests
(TestBasicIntervals / TestBrouwerianQuery / TestIntervalScoring).

Operator -> reference semantics (file:line under /root/reference/lucene/core/
src/java/org/apache/lucene/search/intervals/):

  TermIter        TermIntervalIterator.java:28   one (p,p) per position
  ConjIter        ConjunctionIntervalIterator.java:34 + IntervalQueueAnd.java:23
                  (unordered AND; queue keyed begin asc / end desc; candidate
                  spans top.begin..rightExtreme; matchDistance =
                  rightExtremeBegin - currentTopEnd - 1)
  OrderedConjIter OrderedConjunctionIntervalIterator.java:33 (AND<; operands
                  in order, successive matches non-overlapping; matchDistance
                  = (last.begin - (k-1)) - first.end)
  DisjIter        DisjunctionIntervalIterator.java:34 + IntervalQueueOr.java:22
                  (k-way merge keyed begin asc / end asc, drops dominated)
  BlockIter       BlockIntervalIterator.java:34 (exact phrase, per-slot gaps)
  BrouwerianIter  BrouwerianIntervalIterator.java:35 (difference M - S)
  CombinedIter    ../ConjunctionScorer.java:126-131 via
                  CombinedIntervalIterator.java:25 (BooleanQuery MUST merges
                  child interval streams doc-locally, no covering composite)
  WithinIter      WithinIntervalFilter.java:27 (matchDistance <= slop)
  RangeIter       RangeIntervalFilter.java:27 (position window)
  MinFreqIter     MinFrequencyFilter.java:22 (>= n intervals per doc)
  RangeFreqIter   RangeFrequencyFilter.java:22 (count within [min,max])

UnorderedNear applies the adjusted slop ``slop + n_subqueries - 2``
(UnorderedNearQuery.java:46); OrderedNear wires WithinOrderedFilter
(OrderedNearQuery.java:44-47).

Each iterator exposes ``next() -> Interval | None`` and
``match_distance() -> int``; a doc matches a query iff its iterator yields at
least one interval (IntervalFilterScorer.nextDoc, IntervalFilterQuery.java:343-352).
"""

from __future__ import annotations

import heapq

from ..search import queries as Q

NEG_INF = -(1 << 60)
POS_INF = 1 << 60


class Interval:
    __slots__ = ("begin", "end")

    def __init__(self, begin: int = NEG_INF, end: int = NEG_INF):
        self.begin = begin
        self.end = end

    def copy(self) -> "Interval":
        return Interval(self.begin, self.end)

    def less_than_exclusive(self, other: "Interval") -> bool:
        return self.begin < other.begin and self.end < other.end

    def contains(self, other: "Interval") -> bool:
        return self.begin <= other.begin and other.end <= self.end

    def overlaps(self, other: "Interval") -> bool:
        return self.contains(other) or other.contains(self)

    def __repr__(self):  # pragma: no cover
        return f"[{self.begin},{self.end}]"


class IntervalIterator:
    """Per-doc iterator contract (IntervalIterator.java:28)."""

    __slots__ = ()

    def next(self) -> Interval | None:  # pragma: no cover - abstract
        raise NotImplementedError

    def match_distance(self) -> int:
        return 0

    def collect(self, sink: "MatchSink") -> None:
        raise NotImplementedError

    def subs(self) -> list["IntervalIterator"]:
        return []


class MatchSink:
    """Replicates IntervalTestBase.MatchCollector: dedup + sort matches.

    Matches are deduplicated and ordered by (doc implicit, begin asc,
    end desc) exactly like the TreeSet<Match> comparator
    (IntervalTestBase.java:221-230).
    """

    def __init__(self):
        self.matches: set[tuple[int, int]] = set()

    def leaf(self, interval: Interval) -> None:
        self.matches.add((interval.begin, interval.end))

    def composite(self, interval: Interval) -> None:
        self.matches.add((interval.begin, interval.end))

    def sorted(self) -> list[tuple[int, int]]:
        return sorted(self.matches, key=lambda t: (t[0], -t[1]))


class TermIter(IntervalIterator):
    """One interval (p, p) per occurrence (TermIntervalIterator.java:52-61)."""

    __slots__ = ("positions", "idx", "current")

    def __init__(self, positions):
        self.positions = positions
        self.idx = 0
        self.current: Interval | None = None

    def next(self) -> Interval | None:
        if self.idx >= len(self.positions):
            self.current = None
            return None
        p = self.positions[self.idx]
        self.idx += 1
        self.current = Interval(p, p)
        return self.current

    def collect(self, sink: MatchSink) -> None:
        if self.current is not None:
            sink.leaf(self.current)


class ReplayIter(IntervalIterator):
    """Replays a materialized (interval, match_distance) stream.

    Parents consume child streams eagerly-materialized per doc; replay is
    semantically identical to lazy pull for these deterministic algorithms.
    Composite children collect their current interval as a composite match.
    """

    __slots__ = ("items", "idx", "current", "_dist", "child")

    def __init__(self, items: list[tuple[Interval, int]], child: IntervalIterator | None = None):
        self.items = items
        self.idx = 0
        self.current: Interval | None = None
        self._dist = 0
        self.child = child

    def next(self) -> Interval | None:
        if self.idx >= len(self.items):
            return None  # keep `current` at the last yielded interval
        iv, d = self.items[self.idx]
        self.idx += 1
        self.current, self._dist = iv, d
        return iv

    def match_distance(self) -> int:
        return self._dist

    def collect(self, sink: MatchSink) -> None:
        if self.current is not None:
            sink.composite(self.current)


class _QueueEntry:
    __slots__ = ("key", "seq", "it", "interval")

    def __init__(self, key, seq, it, interval):
        self.key = key
        self.seq = seq
        self.it = it
        self.interval = interval

    def __lt__(self, other):
        return (self.key, self.seq) < (other.key, other.seq)


class ConjIter(IntervalIterator):
    """Unordered conjunction (ConjunctionIntervalIterator.java:95-119).

    Heap keyed (begin asc, end desc); candidate = (top.begin, rightExtreme);
    emits the antichain of minimal covering intervals.  Supports
    min-should-match via nr_must_match (:59-80).
    """

    __slots__ = (
        "heap",
        "nr_must_match",
        "right_extreme",
        "right_extreme_begin",
        "current_top_end",
        "_match_begin",
        "candidate",
        "children",
        "collect_leaves",
    )

    def __init__(self, iters: list[IntervalIterator], nr_must_match: int | None = None,
                 collect_leaves: bool = False):
        self.children = iters
        self.collect_leaves = collect_leaves
        self.nr_must_match = len(iters) if nr_must_match is None else nr_must_match
        self.heap: list[_QueueEntry] = []
        self.right_extreme = NEG_INF
        self.right_extreme_begin = NEG_INF
        self.current_top_end = NEG_INF
        self._match_begin = NEG_INF
        self.candidate = Interval()
        for seq, it in enumerate(iters):
            iv = it.next()
            if iv is not None:
                self._update_right_extreme(iv)
                heapq.heappush(self.heap, _QueueEntry((iv.begin, -iv.end), seq, it, iv))

    def _update_right_extreme(self, iv: Interval) -> None:
        if self.right_extreme <= iv.end:
            self.right_extreme = iv.end
            self.right_extreme_begin = iv.begin

    def _advance(self) -> None:
        top = self.heap[0]
        iv = top.it.next()
        if iv is not None:
            top.interval = iv
            top.key = (iv.begin, -iv.end)
            self._update_right_extreme(iv)
            heapq.heapreplace(self.heap, top)
        else:
            heapq.heappop(self.heap)

    def _update_candidate(self) -> None:
        top = self.heap[0].interval
        self.candidate.begin = top.begin
        self.candidate.end = self.right_extreme
        self.current_top_end = top.end

    def next(self) -> Interval | None:
        while (
            len(self.heap) >= self.nr_must_match
            and self.heap[0].interval.begin == self.candidate.begin
        ):
            self._advance()
        if len(self.heap) < self.nr_must_match or self.nr_must_match <= 0:
            return None
        while True:
            self._update_candidate()
            top = self.heap[0].interval
            if self.candidate.begin == top.begin and self.candidate.end == top.end:
                return self.candidate
            self._match_begin = self.right_extreme_begin
            self._advance()
            if not (
                len(self.heap) >= self.nr_must_match and self.candidate.end == self.right_extreme
            ):
                break
        return self.candidate

    def match_distance(self) -> int:
        return self._match_begin - self.current_top_end - 1

    def collect(self, sink: MatchSink) -> None:
        sink.composite(self.candidate)
        if self.collect_leaves:
            for it in self.children:
                it.collect(sink)

    def subs(self) -> list[IntervalIterator]:
        return self.children


class OrderedConjIter(IntervalIterator):
    """Ordered conjunction (OrderedConjunctionIntervalIterator.java:77-113)."""

    __slots__ = (
        "iters", "intervals", "last", "index", "_dist", "interval", "children",
        "collect_leaves",
    )

    def __init__(self, iters: list[IntervalIterator], collect_leaves: bool = False):
        assert len(iters) > 1
        self.iters = iters
        self.children = iters
        self.last = len(iters) - 1
        self.intervals: list[Interval | None] = [Interval(NEG_INF, NEG_INF) for _ in iters]
        self.intervals[0] = iters[0].next()
        self.index = 1
        self._dist = 0
        self.interval = Interval(POS_INF, POS_INF)
        self.collect_leaves = collect_leaves

    def next(self) -> Interval | None:
        if self.intervals[0] is None:
            return None
        self.interval = Interval(POS_INF, POS_INF)
        b = POS_INF
        while True:
            while True:
                previous = self.intervals[self.index - 1]
                if previous.end >= b:
                    return None if self.interval.begin == POS_INF else self.interval
                if (
                    self.index == len(self.intervals)
                    or self.intervals[self.index].begin > previous.end
                ):
                    break
                current = self.intervals[self.index]
                while True:
                    if current.end >= b:
                        return None if self.interval.begin == POS_INF else self.interval
                    nxt = self.iters[self.index].next()
                    if nxt is None:
                        return None if self.interval.begin == POS_INF else self.interval
                    current = self.intervals[self.index] = nxt
                    if current.begin > previous.end:
                        break
                self.index += 1
            first, last = self.intervals[0], self.intervals[self.last]
            self.interval = Interval(first.begin, last.end)
            self._dist = (last.begin - self.last) - first.end
            b = last.begin
            self.index = 1
            self.intervals[0] = self.iters[0].next()
            if self.intervals[0] is None:
                return self.interval

    def match_distance(self) -> int:
        return self._dist

    def collect(self, sink: MatchSink) -> None:
        sink.composite(self.interval)
        if self.collect_leaves:
            for it in self.iters:
                it.collect(sink)

    def subs(self) -> list[IntervalIterator]:
        return self.children


class DisjIter(IntervalIterator):
    """Disjunction k-way merge (DisjunctionIntervalIterator.java:65-77)."""

    __slots__ = ("heap", "candidate", "children", "_top")

    def __init__(self, iters: list[IntervalIterator]):
        self.children = iters
        self.heap: list[_QueueEntry] = []
        self.candidate = Interval()
        self._top: IntervalIterator | None = None
        for seq, it in enumerate(iters):
            iv = it.next()
            if iv is not None:
                heapq.heappush(self.heap, _QueueEntry((iv.begin, iv.end), seq, it, iv))

    def _advance(self) -> None:
        top = self.heap[0]
        iv = top.it.next()
        if iv is not None:
            top.interval = iv
            top.key = (iv.begin, iv.end)
            heapq.heapreplace(self.heap, top)
        else:
            heapq.heappop(self.heap)

    def next(self) -> Interval | None:
        while self.heap and (
            self.heap[0].interval.begin < self.candidate.begin
            or (
                self.heap[0].interval.begin == self.candidate.begin
                and self.heap[0].interval.end <= self.candidate.end
            )
        ):
            self._advance()
        if not self.heap:
            return None
        self.candidate = self.heap[0].interval.copy()
        self._top = self.heap[0].it
        return self.candidate

    def match_distance(self) -> int:
        return self._top.match_distance() if self._top is not None else 0

    def collect(self, sink: MatchSink) -> None:
        sink.composite(self.candidate)
        if self._top is not None:
            self._top.collect(sink)

    def subs(self) -> list[IntervalIterator]:
        return self.children


class CombinedIter(IntervalIterator):
    """BooleanQuery-MUST interval stream: doc-local k-way merge of children
    ordered by (begin asc, end desc-ish strictlyLessThan), no own composite
    (CombinedIntervalIterator.java:25; collect replays only the top child)."""

    __slots__ = ("heap", "current", "_top", "children")

    def __init__(self, iters: list[IntervalIterator]):
        self.children = iters
        self.heap: list[_QueueEntry] = []
        self.current: Interval | None = None
        self._top: IntervalIterator | None = None
        for seq, it in enumerate(iters):
            iv = it.next()
            if iv is not None:
                # strictlyLessThan: begin asc, then end asc (Interval.java:88-92)
                heapq.heappush(self.heap, _QueueEntry((iv.begin, iv.end), seq, it, iv))

    def next(self) -> Interval | None:
        if not self.heap:
            return None
        top = self.heap[0]
        self.current = top.interval.copy()
        self._top = top.it
        iv = top.it.next()
        if iv is not None:
            top.interval = iv
            top.key = (iv.begin, iv.end)
            heapq.heapreplace(self.heap, top)
        else:
            heapq.heappop(self.heap)
        return self.current

    def collect(self, sink: MatchSink) -> None:
        # the reference snapshots the top child's positions BEFORE advancing
        # it (CombinedIntervalIterator.snapShotSubPositions); in the eager
        # model the child's interval at emission == the emitted interval
        if self.current is not None:
            sink.composite(self.current)

    def subs(self) -> list[IntervalIterator]:
        return self.children


class BlockIter(IntervalIterator):
    """Exact phrase with per-slot gaps (BlockIntervalIterator.java:112-148)."""

    __slots__ = ("iters", "intervals", "gaps", "last", "interval", "children")

    def __init__(self, iters: list[IntervalIterator], gaps: list[int] | None = None):
        assert len(iters) > 1
        self.iters = iters
        self.children = iters
        self.last = len(iters) - 1
        self.gaps = gaps if gaps is not None else [1] * len(iters)
        self.intervals: list[Interval | None] = [Interval(NEG_INF, NEG_INF) for _ in iters]
        self.interval = Interval()

    def next(self) -> Interval | None:
        self.intervals[0] = self.iters[0].next()
        if self.intervals[0] is None:
            return None
        offset = 0
        i = 1
        while i < len(self.iters):
            gap = self.gaps[i]
            while self.intervals[i].begin + gap <= self.intervals[i - 1].end:
                nxt = self.iters[i].next()
                if nxt is None:
                    return None
                self.intervals[i] = nxt
            offset += gap
            if self.intervals[i].begin == self.intervals[i - 1].end + gap:
                i += 1
            else:
                while True:
                    self.intervals[0] = self.iters[0].next()
                    if self.intervals[0] is None:
                        return None
                    if not self.intervals[0].begin < self.intervals[i].end - offset:
                        break
                i = 1
                offset = 0
        self.interval = Interval(self.intervals[0].begin, self.intervals[self.last].end)
        return self.interval

    def match_distance(self) -> int:
        return self.intervals[self.last].begin - self.intervals[0].end

    def collect(self, sink: MatchSink) -> None:
        sink.composite(self.interval)

    def subs(self) -> list[IntervalIterator]:
        return self.children


class BrouwerianIter(IntervalIterator):
    """Difference M - S (BrouwerianIntervalIterator.java:71-97)."""

    __slots__ = ("minuend", "subtracted", "sub_interval", "current", "sub_on_doc")

    def __init__(self, minuend: IntervalIterator, subtracted: IntervalIterator | None):
        self.minuend = minuend
        self.subtracted = subtracted
        self.sub_on_doc = subtracted is not None
        self.sub_interval: Interval | None = Interval(NEG_INF, NEG_INF)
        self.current: Interval | None = None

    def next(self) -> Interval | None:
        if not self.sub_on_doc or self.sub_interval is None:
            self.current = self.minuend.next()
            return self.current
        while True:
            self.current = self.minuend.next()
            if self.current is None:
                return None
            while self.sub_interval is not None and self.sub_interval.less_than_exclusive(
                self.current
            ):
                self.sub_interval = self.subtracted.next()
            if self.sub_interval is None or not self.current.overlaps(self.sub_interval):
                return self.current

    def match_distance(self) -> int:
        return self.minuend.match_distance()

    def collect(self, sink: MatchSink) -> None:
        if self.current is not None:
            sink.composite(self.current)
        self.minuend.collect(sink)

    def subs(self) -> list[IntervalIterator]:
        return [self.minuend] + ([self.subtracted] if self.subtracted else [])


class WithinIter(IntervalIterator):
    """Keep intervals with match_distance <= slop (WithinIntervalFilter.java:72-79)."""

    __slots__ = ("inner", "slop", "interval", "collect_leaves")

    def __init__(self, inner: IntervalIterator, slop: int, collect_leaves: bool = True):
        self.inner = inner
        self.slop = slop
        self.interval: Interval | None = None
        self.collect_leaves = collect_leaves

    def next(self) -> Interval | None:
        while True:
            self.interval = self.inner.next()
            if self.interval is None:
                return None
            if self.inner.match_distance() <= self.slop:
                return self.interval

    def match_distance(self) -> int:
        return self.inner.match_distance()

    def collect(self, sink: MatchSink) -> None:
        if self.interval is not None:
            sink.composite(self.interval)
        if self.collect_leaves:
            self.inner.collect(sink)

    def subs(self) -> list[IntervalIterator]:
        return [self.inner]


class RangeIter(IntervalIterator):
    """Position window filter (RangeIntervalFilter.java:72-83): stops at the
    first interval ending past `end`; keeps those with begin >= start."""

    __slots__ = ("inner", "start", "end", "interval")

    def __init__(self, inner: IntervalIterator, start: int, end: int):
        self.inner = inner
        self.start = start
        self.end = end
        self.interval: Interval | None = None

    def next(self) -> Interval | None:
        while True:
            self.interval = self.inner.next()
            if self.interval is None:
                return None
            if self.interval.end > self.end:
                return None
            if self.interval.begin >= self.start:
                return self.interval

    def match_distance(self) -> int:
        return self.inner.match_distance()

    def collect(self, sink: MatchSink) -> None:
        if self.interval is not None:
            sink.composite(self.interval)
        self.inner.collect(sink)

    def subs(self) -> list[IntervalIterator]:
        return [self.inner]


def min_freq_filter(items: list[tuple[Interval, int]], min_freq: int) -> list:
    """MinFrequencyFilter.java: doc matches only with >= min_freq intervals."""
    return items if len(items) >= min_freq else []


def range_freq_filter(items: list[tuple[Interval, int]], min_freq: int, max_freq: int) -> list:
    """RangeFrequencyFilter.java: doc matches iff min <= count <= max."""
    return items if min_freq <= len(items) <= max_freq else []


# --------------------------------------------------------------------------
# Query tree -> per-doc evaluation


def _materialize(it: IntervalIterator) -> list[tuple[Interval, int]]:
    out = []
    while True:
        iv = it.next()
        if iv is None:
            return out
        out.append((iv.copy(), it.match_distance()))


def build_iter(q, positions: dict[str, list[int]]):
    """Build a per-doc IntervalIterator for query `q`, or None if the doc
    does not match `q`'s document-level predicate.

    Composite sub-results are materialized then replayed — semantically
    identical to lazy pull (the algorithms are deterministic), and it lets
    the doc-match test (>=1 interval) share work with parent composition.
    """
    if isinstance(q, Q.Term):
        pos = positions.get(q.term)
        return TermIter(pos) if pos else None

    if isinstance(q, Q.Boolean):
        if q.must_not and any(build_iter(c, positions) is not None for c in q.must_not):
            return None
        subs = list(q.must) + list(q.should)
        if q.must:
            must_iters = [build_iter(c, positions) for c in q.must]
            if any(it is None for it in must_iters):
                return None
            should_iters = [
                it for c in q.should if (it := build_iter(c, positions)) is not None
            ]
            iters = must_iters + should_iters
            return iters[0] if len(iters) == 1 else CombinedIter(iters)
        # pure disjunction (SHOULD), optional minimum-should-match
        should_iters = [it for c in q.should if (it := build_iter(c, positions)) is not None]
        msm = max(q.min_should_match, 1)
        if len(should_iters) < msm:
            return None
        if len(should_iters) == 1:
            return should_iters[0]
        return DisjIter(should_iters)

    if isinstance(q, Q.Phrase):
        iters = [build_iter(Q.Term(t), positions) for t in q.terms]
        if any(it is None for it in iters):
            return None
        if len(iters) == 1:
            return iters[0]
        if q.slop == 0:
            # ExactPhraseScorer semantics (ExactPhraseScorer.java:30): term_i
            # must occur at p+i; handles repeated terms, unlike BlockIter.
            starts = set(positions[q.terms[0]])
            for i, term in enumerate(q.terms[1:], start=1):
                starts &= {p - i for p in positions[term]}
            k = len(q.terms) - 1
            items = [(Interval(p, p + k), k and 0) for p in sorted(starts)]
            return ReplayIter(items) if items else None
        # sloppy phrase: unordered conjunction within slop (kernel semantics;
        # scoring uses sloppyFreq of matchDistance)
        conj = ConjIter(iters)
        return _replay_nonempty(WithinIter(conj, q.slop))

    if isinstance(q, Q.NGramPhrase):
        # gapped exact phrase over the REWRITTEN slots (NGramPhraseQuery.java
        # :33 rewrite: every n-th gram + the last, positions preserved);
        # interval spans the FULL original phrase width
        kept = q.kept_slots()
        if any(positions.get(t) is None for t, _ in kept):
            return None
        starts = set(positions[kept[0][0]])  # offset 0 always kept
        for t, off in kept[1:]:
            starts &= {p - off for p in positions[t]}
        k = len(q.terms) - 1
        items = [(Interval(p, p + k), k and 0) for p in sorted(starts)]
        return ReplayIter(items) if items else None

    if isinstance(q, Q.MultiPhrase):
        slot_iters = []
        for slot in q.slots:
            alts = [it for t in slot if (it := build_iter(Q.Term(t), positions)) is not None]
            if not alts:
                return None
            slot_iters.append(alts[0] if len(alts) == 1 else DisjIter(alts))
        if len(slot_iters) == 1:
            # one-position MultiPhrase rewrites to a pure disjunction of its
            # slot terms (MultiPhraseQuery.java:301-308 "optimize one-term
            # case") — no block constraint to enforce
            return _replay_nonempty(slot_iters[0])
        return _replay_nonempty(BlockIter(slot_iters))

    if isinstance(q, Q.OrderedNear):
        iters = [build_iter(c, positions) for c in q.subs]
        if any(it is None for it in iters):
            return None
        inner = (
            OrderedConjIter(iters, q.collect_leaves) if len(iters) > 1 else iters[0]
        )
        return _replay_nonempty(WithinIter(inner, q.slop, q.collect_leaves))

    if isinstance(q, Q.UnorderedNear):
        iters = [build_iter(c, positions) for c in q.subs]
        if any(it is None for it in iters):
            return None
        adjusted = q.slop + len(q.subs) - 2  # UnorderedNearQuery.java:46
        inner = (
            ConjIter(iters, collect_leaves=q.collect_leaves)
            if len(iters) > 1
            else iters[0]
        )
        return _replay_nonempty(WithinIter(inner, adjusted, q.collect_leaves))

    if isinstance(q, Q.NonOverlapping):
        minuend = build_iter(q.minuend, positions)
        if minuend is None:
            return None
        subtrahend = build_iter(q.subtrahend, positions)
        return _replay_nonempty(BrouwerianIter(minuend, subtrahend))

    if isinstance(q, Q.IntervalFiltered):
        inner = build_iter(q.inner, positions)
        if inner is None:
            return None
        f = q.filt
        if isinstance(f, Q.WithinFilter):
            return _replay_nonempty(WithinIter(inner, f.slop, q.collect_leaves))
        if isinstance(f, Q.RangeFilter):
            return _replay_nonempty(RangeIter(inner, f.start, f.end))
        if isinstance(f, Q.MinFreqFilter):
            items = min_freq_filter(_materialize(inner), f.min_freq)
            return ReplayIter(items) if items else None
        if isinstance(f, Q.RangeFreqFilter):
            items = range_freq_filter(_materialize(inner), f.min_freq, f.max_freq)
            return ReplayIter(items) if items else None
        if isinstance(f, Q.BlockFilter):
            # fresh sub-iterators: composite constructors eagerly pull each
            # sub's first interval (Lucene wraps before scorerAdvanced, so
            # its subs are still unprimed at this point)
            if isinstance(q.inner, Q.Boolean) and q.inner.must and not q.inner.should:
                subs = [build_iter(c, positions) for c in q.inner.must]
                if any(s2 is None for s2 in subs):
                    return None
            else:
                subs = inner.subs()
            return _replay_nonempty(BlockIter(subs))
        raise ValueError(f"unknown interval filter {f!r}")

    if isinstance(q, Q.ConstantScore):
        return build_iter(q.inner, positions)

    raise ValueError(f"no interval iterator for query type {type(q).__name__}")


def _replay_nonempty(it: IntervalIterator):
    items = _materialize(it)
    return ReplayIter(items, child=it) if items else None


def match_intervals(q, positions: dict[str, list[int]]) -> list[tuple[int, int]] | None:
    """Emitted composite intervals of `q` on one doc, or None if no match."""
    it = build_iter(q, positions)
    if it is None:
        return None
    out = [(iv.begin, iv.end) for iv, _ in _materialize(it)] if not isinstance(
        it, ReplayIter
    ) else [(iv.begin, iv.end) for iv, _ in it.items[it.idx :]]
    return out if out else None


def match_distances(q, positions: dict[str, list[int]]) -> list[int] | None:
    """match_distance per surviving interval (for sloppyFreq scoring)."""
    it = build_iter(q, positions)
    if it is None:
        return None
    items = it.items if isinstance(it, ReplayIter) else _materialize(it)
    return [d for _, d in items] if items else None


def collect_matches(q, positions: dict[str, list[int]]) -> list[tuple[int, int]] | None:
    """MatchCollector semantics: iterate root, replay collect() per emitted
    interval, dedup + sort (begin asc, end desc).  Used by the golden-table
    parity tests (IntervalTestBase.checkIntervals)."""
    it = build_iter(q, positions)
    if it is None:
        return None
    # phrase/block queries with single-position slots collect each slot as a
    # leaf (BlockIntervalIterator.collect with collectLeaves, the PhraseQuery
    # default); the leaves are exactly the positions inside the span
    phrase_leaves = isinstance(q, (Q.Phrase, Q.MultiPhrase)) and getattr(q, "slop", 0) == 0
    sink = MatchSink()
    matched = False
    while True:
        iv = it.next()
        if iv is None:
            break
        matched = True
        if isinstance(it, ReplayIter) and it.child is not None:
            # replay the wrapped iterator's collect with its state at emission
            sink.composite(iv)
            _collect_child(it.child, iv, sink)
        else:
            it.collect(sink)
        if phrase_leaves:
            for x in range(iv.begin, iv.end + 1):
                sink.leaf(Interval(x, x))
    if not matched:
        return None
    return sink.sorted()


def fielded_collect(
    q, positions: dict[tuple[str, str], list[int]], default_field: str
) -> list[tuple[str, int, int]] | None:
    """Cross-field leaf-interval collection (TestFieldedIntervals contract).

    The reference drives the MatchCollector through each Boolean scorer's
    CombinedIntervalIterator (CombinedIntervalIterator.java:25): over a full
    iteration every present leaf term becomes queue-top at least once, so
    the collected set is exactly the union of every present leaf term's
    (field, p, p) positions for docs matching the Boolean tree — deduped and
    ordered (field asc, begin asc, end desc), the TreeSet<Match> comparator
    (IntervalTestBase.java:220-229).  Returns None if the doc does not match.
    """

    def _fk(node: Q.Term) -> tuple[str, str]:
        return (node.field or default_field, node.term)

    def matches(node) -> bool:
        if isinstance(node, Q.Term):
            return bool(positions.get(_fk(node)))
        if isinstance(node, Q.ConstantScore):
            return matches(node.inner)
        if isinstance(node, Q.Boolean):
            if any(matches(c) for c in node.must_not):
                return False
            if not all(matches(c) for c in node.must):
                return False
            if node.should:
                n = sum(1 for c in node.should if matches(c))
                msm = node.min_should_match if node.must else max(node.min_should_match, 1)
                if n < msm:
                    return False
            return True
        raise ValueError(
            f"fielded_collect supports Boolean-of-Terms trees, got {type(node).__name__}"
        )

    if not matches(q):
        return None
    out: set[tuple[str, int, int]] = set()

    def collect(node) -> None:
        if isinstance(node, Q.Term):
            f, t = _fk(node)
            for p in positions.get((f, t), []):
                out.add((f, p, p))
        elif isinstance(node, Q.ConstantScore):
            collect(node.inner)
        elif isinstance(node, Q.Boolean):
            for c in (*node.must, *node.should):
                collect(c)

    collect(q)
    return sorted(out, key=lambda m: (m[0], m[1], -m[2]))


def _collect_child(child: IntervalIterator, emitted: Interval, sink: MatchSink) -> None:
    """Approximate the snapshot replay: the wrapped composite collects the
    emitted interval; leaf/substructure collection follows each class's
    collect_leaves flag captured at construction."""
    if isinstance(child, WithinIter):
        if child.collect_leaves:
            child.inner.collect(sink)
    elif isinstance(child, (BrouwerianIter,)):
        child.minuend.collect(sink)
