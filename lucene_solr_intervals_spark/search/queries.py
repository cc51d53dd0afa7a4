"""Logical query tree — the engine's `Query` dataclasses.

Mirrors the reference's query surface (SURVEY.md §2.4/§2.5):

  Term              org.apache.lucene.search.TermQuery (TermQuery.java:41)
  Boolean           BooleanQuery MUST/SHOULD/MUST_NOT + minimumNumberShouldMatch
                    (BooleanQuery.java:39, MinShouldMatchSumScorer.java:38)
  Phrase            PhraseQuery exact/sloppy (PhraseQuery.java:49)
  DisjunctionMax    DisjunctionMaxQuery (DisjunctionMaxQuery.java:45)
  ConstantScore     ConstantScoreQuery (ConstantScoreQuery.java:37)
  MatchAll          MatchAllDocsQuery (MatchAllDocsQuery.java:34)
  Prefix/Wildcard/  multi-term queries expanded against the term dictionary
  Regexp/Fuzzy/     (PrefixQuery.java:34, WildcardQuery.java:43,
  TermRange          RegexpQuery.java:48, FuzzyQuery.java:54, TermRangeQuery.java:43)
  NumericRange      NumericRangeQuery semantics on a numeric doc column
  OrderedNear       intervals.OrderedNearQuery (OrderedNearQuery.java:36)
  UnorderedNear     intervals.UnorderedNearQuery — NOTE adjusted slop
                    slop + n_subqueries - 2 (UnorderedNearQuery.java:46)
  NonOverlapping    intervals.NonOverlappingQuery (Brouwerian difference)
  IntervalFiltered  intervals.IntervalFilterQuery with Within/Range/MinFreq/
                    RangeFreq/Block filters (IntervalFilterQuery.java:51)

These are pure logical nodes: no Spark, no I/O.  The planner rewrites them
(rewrite fixpoint, multi-term expansion) and the executors interpret them.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    """Marker base class for all logical query nodes."""

    __slots__ = ()


@dataclass(frozen=True)
class Term(Query):
    """TermQuery (TermQuery.java:41).  `field` binds the term to a specific
    indexed field (Term.java:38); None means the index's default field."""

    term: str
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class MatchAll(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class Boolean(Query):
    must: tuple[Query, ...] = ()
    should: tuple[Query, ...] = ()
    must_not: tuple[Query, ...] = ()
    min_should_match: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class Phrase(Query):
    """PhraseQuery.  With slop > 0 the fork scores via SloppyPhraseScorer
    (PhraseQuery.java:296) — `scorer="classic"`, the default, reproduces
    that algorithm incl. LUCENE-3412 repeated-term handling
    (search/sloppy.py); `scorer="intervals"` selects the intervals module's
    SloppyIntervalIterator semantics instead (minimal-interval antichain —
    SQL-expressible, used by the DuckDB-oracle parity query)."""

    terms: tuple[str, ...]
    slop: int = 0
    boost: float = 1.0
    field: str | None = None
    scorer: str = "classic"


@dataclass(frozen=True)
class MultiPhrase(Query):
    """Phrase with term alternatives per slot (MultiPhraseQuery.java:63).
    slop > 0 scores through the SloppyPhraseScorer walk over per-slot
    position unions (UnionDocsAndPositionsEnum, MultiPhraseQuery.java:216),
    incl. the multi-term-repeat handling."""

    slots: tuple[tuple[str, ...], ...]
    slop: int = 0
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class ComplexPhrase(Query):
    """ComplexPhraseQueryParser's query (lucene/queryparser/src/java/org/
    apache/lucene/queryparser/complexPhrase/ComplexPhraseQueryParser.java:60):
    a phrase whose slots may be wildcards, prefixes, fuzzies, or
    alternation groups — '"(john jonathon) smyth*"'.  Rewrites to a
    MultiPhrase (slop == 0) or an ordered near over slot disjunctions
    (slop > 0, SpanNearQuery inOrder=true), expanding each multi-term slot
    against the term dictionary."""

    slots: tuple[tuple[Query, ...], ...]
    slop: int = 0
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class Boosting(Query):
    """BoostingQuery (lucene/queries/src/java/org/apache/lucene/queries/
    BoostingQuery.java:40): score `match` normally, but docs ALSO matching
    `context` have their score multiplied by `context_boost` (use < 1 to
    demote, e.g. down-rank docs containing boilerplate terms without
    excluding them)."""

    match: Query
    context: Query
    context_boost: float = 0.5
    boost: float = 1.0


@dataclass(frozen=True)
class CustomScore(Query):
    """CustomScoreQuery (lucene/queries/src/java/org/apache/lucene/queries/
    CustomScoreQuery.java:51): score `sub` normally, then customize with
    value sources over stored fields — the default CustomScoreProvider
    (:182 customScore) MULTIPLIES the subquery score by each value-source
    score.  A ValueSource maps to a native SQL expression over the corpus
    columns (the FunctionQuery mapping), so the whole customization stays
    JVM-side; a doc missing from the corpus join contributes 1.0 (the
    provider's behavior for a value source with no value)."""

    sub: Query
    value_exprs: tuple[str, ...] = ()
    boost: float = 1.0


@dataclass(frozen=True)
class PayloadTerm(Query):
    """PayloadTermQuery (lucene/core/src/java/org/apache/lucene/search/
    payloads/PayloadTermQuery.java:55): a TermQuery whose score is combined
    with a PayloadFunction over the payloads at the matching positions —
    score = spanScore * payloadScore when include_span_score (the default),
    else payloadScore alone.  fn: avg (AveragePayloadFunction), min, max
    (MinPayloadFunction / MaxPayloadFunction), sum."""

    term: str
    fn: str = "avg"
    include_span_score: bool = True
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class NGramPhrase(Query):
    """NGramPhraseQuery (NGramPhraseQuery.java:33): a phrase over an n-gram
    analyzed field.  Because consecutive grams overlap by n-1 characters,
    matching every n-th gram PLUS the last implies the full phrase; the
    rewrite keeps only those slots (positions preserved), cutting the terms
    checked by ~1/n.  Executed as a gapped exact phrase."""

    terms: tuple[str, ...]
    n: int = 2
    boost: float = 1.0
    field: str | None = None

    def kept_slots(self) -> tuple[tuple[str, int], ...]:
        """(term, position_offset) pairs after the rewrite
        (NGramPhraseQuery.rewrite: keep i % n == 0 and the last slot)."""
        last = len(self.terms) - 1
        idxs = [i for i in range(len(self.terms)) if i % self.n == 0]
        if last not in idxs:
            idxs.append(last)
        return tuple((self.terms[i], i) for i in idxs)


@dataclass(frozen=True)
class DisjunctionMax(Query):
    subs: tuple[Query, ...]
    tie_breaker: float = 0.0
    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScore(Query):
    inner: Query
    boost: float = 1.0


@dataclass(frozen=True)
class Prefix(Query):
    prefix: str
    boost: float = 1.0
    field: str | None = None
    rewrite: str = "constant"  # constant | scoring_boolean (MultiTermQuery.java:92,114)
    max_expansions: int | None = None  # TopTerms cap (MultiTermQuery.java:234)


@dataclass(frozen=True)
class Wildcard(Query):
    pattern: str  # Lucene syntax: * = any run, ? = one char
    boost: float = 1.0
    field: str | None = None
    rewrite: str = "constant"
    max_expansions: int | None = None


@dataclass(frozen=True)
class Regexp(Query):
    pattern: str
    boost: float = 1.0
    field: str | None = None
    rewrite: str = "constant"
    max_expansions: int | None = None


@dataclass(frozen=True)
class Fuzzy(Query):
    term: str
    max_edits: int = 2
    boost: float = 1.0
    field: str | None = None
    # FuzzyQuery's default rewrite IS TopTerms scoring-boolean with 50
    # expansions (FuzzyQuery.java:54 defaultMaxExpansions, :129 rewrite);
    # each expanded term carries boost = 1 - edits/len (FuzzyTermsEnum
    # .java:228), so closer terms rank higher
    rewrite: str = "scoring_boolean"
    max_expansions: int | None = 50
    # non-fuzzy prefix (FuzzyQuery.java prefixLength): the first N chars
    # must match exactly; edits apply to the suffix only.  Trimming an
    # identical prefix preserves Levenshtein distance, so the whole-string
    # predicate stays exact while the prefix becomes a pushdown-able range.
    prefix_length: int = 0
    # True when the edit count came from an explicit `term~N` / `term~0.x`
    # on the query string; False for bare `term~`.  StandardQueryParser's
    # FuzzyConfig default min-sim only overrides the IMPLICIT default —
    # an explicit similarity on the query wins (reference flexible parser
    # FuzzyQueryNodeBuilder semantics).
    edits_explicit: bool = True


@dataclass(frozen=True)
class TermRange(Query):
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = False
    boost: float = 1.0
    field: str | None = None
    rewrite: str = "constant"
    max_expansions: int | None = None


@dataclass(frozen=True)
class NumericRange(Query):
    column: str
    lower: float | None
    upper: float | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


# ---------------------------------------------------------------- intervals


@dataclass(frozen=True)
class OrderedNear(Query):
    """Subqueries must match in order with overall slop (AND<)."""

    slop: int
    subs: tuple[Query, ...]
    collect_leaves: bool = False
    boost: float = 1.0


@dataclass(frozen=True)
class UnorderedNear(Query):
    """Subqueries in any order within slop; internal slop is slop+n-2."""

    slop: int
    subs: tuple[Query, ...]
    collect_leaves: bool = False
    boost: float = 1.0


@dataclass(frozen=True)
class NonOverlapping(Query):
    """Minuend intervals that do not overlap any subtrahend interval."""

    minuend: Query
    subtrahend: Query
    boost: float = 1.0


@dataclass(frozen=True)
class WithinFilter:
    slop: int


@dataclass(frozen=True)
class RangeFilter:
    start: int
    end: int


@dataclass(frozen=True)
class MinFreqFilter:
    min_freq: int


@dataclass(frozen=True)
class RangeFreqFilter:
    min_freq: int
    max_freq: int


@dataclass(frozen=True)
class BlockFilter:
    pass


IntervalFilter = WithinFilter | RangeFilter | MinFreqFilter | RangeFreqFilter | BlockFilter


@dataclass(frozen=True)
class IntervalFiltered(Query):
    """IntervalFilterQuery: doc matches iff >=1 interval survives the filter.

    Scoring: freq() is hardcoded to 1 and idf is the sum over all leaf terms
    (IntervalFilterQuery.java:375-377, :135-151).
    """

    inner: Query
    filt: IntervalFilter
    collect_leaves: bool = False
    boost: float = 1.0


def terms_of(q: Query) -> tuple[str, ...]:
    """All leaf terms of a query tree, in depth-first order (with repeats)."""
    if isinstance(q, (Term, PayloadTerm)):
        return (q.term,)
    if isinstance(q, Phrase):
        return tuple(q.terms)
    if isinstance(q, MultiPhrase):
        return tuple(t for slot in q.slots for t in slot)
    if isinstance(q, NGramPhrase):
        # the rewritten query's terms only (scoring follows the rewrite)
        return tuple(t for t, _ in q.kept_slots())
    out: list[str] = []
    for child in children_of(q):
        out.extend(terms_of(child))
    return tuple(out)


def field_term_pairs(q: Query, default_field: str) -> tuple[tuple[str, str], ...]:
    """All leaf (field, term) pairs in depth-first order (with repeats) —
    the multi-field analog of :func:`terms_of` (Term.java:38 binds every
    term to a field)."""
    if isinstance(q, (Term, PayloadTerm)):
        return ((q.field or default_field, q.term),)
    if isinstance(q, Phrase):
        f = q.field or default_field
        return tuple((f, t) for t in q.terms)
    if isinstance(q, MultiPhrase):
        f = q.field or default_field
        return tuple((f, t) for slot in q.slots for t in slot)
    if isinstance(q, NGramPhrase):
        f = q.field or default_field
        return tuple((f, t) for t, _ in q.kept_slots())
    out: list[tuple[str, str]] = []
    for child in children_of(q):
        out.extend(field_term_pairs(child, default_field))
    return tuple(out)


def children_of(q: Query) -> tuple[Query, ...]:
    if isinstance(q, Boolean):
        return (*q.must, *q.should, *q.must_not)
    if isinstance(q, DisjunctionMax):
        return tuple(q.subs)
    if isinstance(q, ConstantScore):
        return (q.inner,)
    if isinstance(q, (OrderedNear, UnorderedNear)):
        return tuple(q.subs)
    if isinstance(q, NonOverlapping):
        return (q.minuend, q.subtrahend)
    if isinstance(q, IntervalFiltered):
        return (q.inner,)
    return ()
