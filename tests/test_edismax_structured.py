"""eDisMax structured first pass (round 8): the full user string runs
through the classic lucene parser BEFORE the escaped dialect, like the
reference's parseOriginalQuery -> parseEscapedQuery order
(ExtendedDismaxQParser.java:183-187).  Grouped sub-expressions now carry
real boolean structure instead of degrading to escaped terms."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.edismax import EDisMaxParser


def _p(**kw):
    kw.setdefault("qf", {"text": 1.0})
    kw.setdefault("default_field", "text")
    return EDisMaxParser(**kw)


def test_grouped_or_and():
    q = _p().parse("(alpha OR beta) AND gamma")
    assert isinstance(q, Q.Boolean)
    assert len(q.must) == 2 and not q.should
    group = q.must[0]
    assert isinstance(group, Q.Boolean) and len(group.should) == 2
    assert {t.term for t in group.should} == {"alpha", "beta"}
    assert q.must[1].term == "gamma"


def test_grouped_negation():
    q = _p().parse("alpha AND (beta OR gamma) -delta")
    assert len(q.must) == 2 and len(q.must_not) == 1
    assert isinstance(q.must[1], Q.Boolean)


def test_group_alias_to_qf_dismax():
    p = _p(qf={"text": 1.0, "source": 2.0}, tie=0.3)
    q = p.parse("(alpha OR beta) AND gamma")
    leaf = q.must[0].should[0]
    assert isinstance(leaf, Q.DisjunctionMax) and leaf.tie_breaker == 0.3
    fields = {(s.field, s.boost) for s in leaf.subs}
    assert fields == {(None, 1.0), ("source", 2.0)}


def test_mm_applies_to_top_level_only():
    p = _p(mm="2")
    q = p.parse("(alpha OR beta) AND gamma")
    # all clauses required at top -> mm over an empty should list
    assert q.min_should_match == 0
    assert q.must[0].min_should_match == 0  # NOT applied inside the group


def test_mm_on_structured_flat():
    q = _p(mm="2").parse("alpha beta gamma")
    assert len(q.should) == 3 and q.min_should_match == 2


def test_explicit_phrase_slop_survives():
    q = _p(qs=5).parse('"key agg"~3')
    ph = q.should[0]
    assert isinstance(ph, Q.Phrase) and ph.slop == 3  # explicit beats qs


def test_qs_default_phrase_slop():
    q = _p(qs=5).parse('"key agg"')
    assert q.should[0].slop == 5


def test_term_boost():
    q = _p().parse("alpha^3 beta")
    assert q.should[0].boost == 3.0 and q.should[1].boost == 1.0


def test_range_aliased():
    p = _p(qf={"text": 1.0, "source": 1.0})
    q = p.parse("[aaa TO bbb]")
    leaf = q.should[0]
    assert isinstance(leaf, Q.DisjunctionMax)
    assert all(isinstance(s, Q.TermRange) for s in leaf.subs)


def test_wildcard_and_fuzzy_structured():
    q = _p().parse("wild* fuzz~1")
    assert isinstance(q.should[0], Q.Prefix)
    assert isinstance(q.should[1], Q.Fuzzy) and q.should[1].max_edits == 1


def test_fielded_leaf_keeps_field():
    q = _p().parse("source:src17 AND alpha")
    assert q.must[0].field == "source"


def test_unbalanced_paren_falls_back_to_escaped():
    # ')' alone breaks the classic parse -> escaped dialect, never throws
    q = _p().parse("alpha ) beta")
    assert isinstance(q, Q.Boolean)
    assert len(q.should) == 2  # ')' escapes away; terms survive


def test_bare_to_falls_back():
    q = _p().parse("alpha TO beta")
    assert {t.term for t in q.should} == {"alpha", "beta"}


def test_restricted_uf_still_structured():
    # uf no longer disables the structured pass: grouping parses...
    q = _p(uf=("text",)).parse("(alpha OR beta) AND gamma")
    assert any(isinstance(c, Q.Boolean) for c in q.must)


def test_restricted_uf_escapes_field_in_structured():
    # ...while a disallowed field prefix is escaped into plain terms
    # BEFORE the classic parse (rebuildUserQuery role)
    def leaves(q):
        if isinstance(q, Q.Boolean):
            for c in q.must + q.should + q.must_not:
                yield from leaves(c)
        elif isinstance(q, Q.DisjunctionMax):
            for c in q.subs:
                yield from leaves(c)
        else:
            yield q

    q = _p(uf=("text",)).parse("secret:stuff AND gamma")
    assert all(getattr(leaf, "field", None) != "secret" for leaf in leaves(q))
    terms = {getattr(leaf, "term", None) for leaf in leaves(q)}
    assert {"secret", "stuff", "gamma"} <= terms


def test_fielded_group_distributes():
    q = _p().parse("source:(src17 OR src18) AND alpha")
    group = q.must[0]
    assert isinstance(group, Q.Boolean)
    assert {t.field for t in group.should} == {"source"}


def test_pf_boosts_still_apply_with_structured():
    p = _p(pf2=("text",), ps=1)
    q = p.parse("key agg row")
    assert len(q.must) == 1 and len(q.should) == 2
    grams = {tuple(b.terms) for b in q.should}
    assert grams == {("key", "agg"), ("agg", "row")}


@settings(max_examples=200, deadline=None)
@given(
    st.text(
        alphabet='ab() "+-~^:*?[]{}ANDORT 123\\',
        max_size=40,
    )
)
def test_never_throws_with_structured(garbage):
    p = _p(qf={"text": 1.0, "source": 2.0}, mm="2<-1", pf2=("text",))
    result = p.parse(garbage)
    assert isinstance(result, Q.Query)
