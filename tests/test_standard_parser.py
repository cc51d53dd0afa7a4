"""StandardQueryParser facade tests (flexible/standard/StandardQueryParser
.java:113 — classic grammar + the ConfigurationKeys surface)."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.parser import StandardQueryParser


def test_default_operator():
    p = StandardQueryParser()
    q = p.parse("a b")
    assert isinstance(q, Q.Boolean) and len(q.should) == 2
    p.set_default_operator("AND")
    assert p.get_default_operator() == "AND"
    q = p.parse("a b")
    assert isinstance(q, Q.Boolean) and len(q.must) == 2


def test_leading_wildcard_guard():
    p = StandardQueryParser()
    with pytest.raises(ValueError):
        p.parse("*erm")
    p.set_allow_leading_wildcard(True)
    q = p.parse("*erm")
    assert isinstance(q, Q.Wildcard) and q.pattern == "*erm"


def test_phrase_slop_default():
    p = StandardQueryParser()
    p.set_phrase_slop(3)
    q = p.parse('"quick fox"')
    assert isinstance(q, Q.Phrase) and q.slop == 3
    # an explicit slop wins over the config default
    q = p.parse('"quick fox"~1')
    assert q.slop == 1


def test_fuzzy_min_sim():
    p = StandardQueryParser()
    p.set_fuzzy_min_sim(0.9)
    q = p.parse("lucene~")  # bare fuzzy -> config minSim -> floatToEdits
    assert isinstance(q, Q.Fuzzy) and q.max_edits == 0  # (1-0.9)*6 = 0.6 -> 0
    q = p.parse("elasticsearch~")
    assert q.max_edits == 1  # (1-0.9)*13 = 1.3 -> 1
    # explicit edit counts are untouched
    q = p.parse("lucene~1")
    assert q.max_edits == 1


def test_multi_fields_and_boosts():
    p = StandardQueryParser()
    p.set_multi_fields(("title", "body"))
    p.set_fields_boost({"title": 2.0})
    q = p.parse("merge")
    assert isinstance(q, Q.Boolean)
    by_field = {c.field: c for c in q.should}
    assert set(by_field) == {"title", "body"}
    assert by_field["title"].boost == 2.0 and by_field["body"].boost == 1.0
    # explicitly fielded clauses stay as written
    q = p.parse("body:merge")
    assert isinstance(q, Q.Term) and q.field == "body"


def test_default_field_binding():
    p = StandardQueryParser()
    q = p.parse("merge", default_field="content")
    assert isinstance(q, Q.Term) and q.field == "content"


def test_with_analyzer_chain():
    from lucene_solr_intervals_spark.analysis.folding import fold_ascii
    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ANALYZERS,
        register_analyzer,
    )

    def _ascii_ws(text):
        if not text:
            return [], [], 0
        terms = [fold_ascii(w).lower() for w in text.split()]
        return terms, list(range(len(terms))), len(terms)

    if "ascii_ws_std" not in ANALYZERS:
        register_analyzer("ascii_ws_std", _ascii_ws)
    p = StandardQueryParser(analyzer="ascii_ws_std")
    q = p.parse("Mötl?*")
    assert isinstance(q, Q.Wildcard) and q.pattern == "motl?*"


def test_default_field_applies_after_rewrites():
    """Review r5: phrase-slop / fuzzy-min-sim rewrites must not skip the
    default_field binding."""
    p = StandardQueryParser()
    p.set_phrase_slop(2)
    q = p.parse('"vector merge"', default_field="title")
    assert isinstance(q, Q.Phrase) and q.slop == 2 and q.field == "title"
    p2 = StandardQueryParser()
    p2.set_fuzzy_min_sim(0.8)
    q = p2.parse("vector~", default_field="body")
    assert isinstance(q, Q.Fuzzy) and q.field == "body" and q.max_edits == 1
