"""Query planner: rewrite fixpoint + stats-aware transforms.

Mirrors the reference's rewrite step (IndexSearcher.createNormalizedWeight:
675-677 runs Query.rewrite to fixpoint before Weight creation):

  1-clause Boolean collapse        BooleanQuery.rewrite (BooleanQuery.java:530-550)
  phrase-of-1 -> TermQuery         PhraseQuery.rewrite (PhraseQuery.java:130)
  nested pure-SHOULD flattening    (disjunction associativity)
  common-terms split               CommonTermsQuery.java:64 — high-df terms
                                   demoted from MUST to SHOULD so the rare
                                   terms drive the conjunction (the
                                   reference's own stop-word-skew fix; same
                                   motive as our salted repartition)

All transforms are score-preserving except common_terms_split, which is the
documented CommonTermsQuery semantics change (opt-in).
"""

from __future__ import annotations

from . import queries as Q


def rewrite(q: Q.Query) -> Q.Query:
    """Apply score-preserving rewrites to fixpoint."""
    prev = None
    while prev != q:
        prev = q
        q = _rewrite_once(q)
    return q


def _rewrite_once(q: Q.Query) -> Q.Query:
    if isinstance(q, Q.Boolean):
        must = tuple(_rewrite_once(c) for c in q.must)
        should = tuple(_rewrite_once(c) for c in q.should)
        must_not = tuple(_rewrite_once(c) for c in q.must_not)
        # flatten nested pure-SHOULD booleans into the parent disjunction
        if not must and not must_not and q.min_should_match <= 1:
            flat: list[Q.Query] = []
            changed = False
            for c in should:
                if (
                    isinstance(c, Q.Boolean)
                    and not c.must
                    and not c.must_not
                    and c.min_should_match <= 1
                    and c.boost == 1.0
                ):
                    flat.extend(c.should)
                    changed = True
                else:
                    flat.append(c)
            if changed:
                should = tuple(flat)
        # 1-clause collapse
        if len(must) == 1 and not should and not must_not and q.boost == 1.0:
            return must[0]
        if len(should) == 1 and not must and not must_not and q.boost == 1.0:
            return should[0]
        return Q.Boolean(must, should, must_not, q.min_should_match, q.boost)
    if isinstance(q, Q.Phrase) and len(q.terms) == 1:
        return Q.Term(q.terms[0], boost=q.boost)
    if isinstance(q, Q.DisjunctionMax):
        return Q.DisjunctionMax(
            tuple(_rewrite_once(c) for c in q.subs), q.tie_breaker, q.boost
        )
    if isinstance(q, Q.ConstantScore):
        return Q.ConstantScore(_rewrite_once(q.inner), q.boost)
    if isinstance(q, (Q.OrderedNear, Q.UnorderedNear)):
        subs = tuple(_rewrite_once(c) for c in q.subs)
        cls = type(q)
        return cls(q.slop, subs, q.collect_leaves, q.boost)
    if isinstance(q, Q.NonOverlapping):
        return Q.NonOverlapping(
            _rewrite_once(q.minuend), _rewrite_once(q.subtrahend), q.boost
        )
    if isinstance(q, Q.IntervalFiltered):
        return Q.IntervalFiltered(
            _rewrite_once(q.inner), q.filt, q.collect_leaves, q.boost
        )
    return q


def common_terms_split(
    q: Q.Boolean, df_by_term: dict[str, int], max_doc: int, cutoff: float = 0.5
) -> Q.Boolean:
    """CommonTermsQuery semantics (CommonTermsQuery.java:64): in an all-term
    conjunction, terms with df/maxDoc > cutoff become optional (SHOULD), so
    execution is driven by the selective terms; scores still include the
    common terms for matching docs."""
    must, should = [], list(q.should)
    for c in q.must:
        if isinstance(c, Q.Term) and df_by_term.get(c.term, 0) / max(max_doc, 1) > cutoff:
            should.append(c)
        else:
            must.append(c)
    if not must:  # all common: degrade to pure disjunction (reference behavior)
        return Q.Boolean(should=tuple(should), min_should_match=q.min_should_match)
    return Q.Boolean(tuple(must), tuple(should), q.must_not, q.min_should_match, q.boost)
