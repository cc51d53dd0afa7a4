"""TestAnalyzingQueryParser transcriptions (queryparser/analyzing).

The reference's ASCIIAnalyzer (fold -> whitespace tokenize -> lowercase)
is registered as a custom chain; expectations are the reference's
wildcard/prefix/range/fuzzy *Expected fixtures (TestAnalyzingQueryParser
.java:66-87)."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.analysis.folding import fold_ascii
from lucene_solr_intervals_spark.analysis.tokenizer import (
    ANALYZERS,
    register_analyzer,
)
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.parser import AnalyzingQueryParser


def _make_ascii_ws():
    """ASCIIAnalyzer analog: whitespace tokenize -> ASCII fold -> lower.
    Built as a CLOSURE so cloudpickle ships it by VALUE if any Spark job
    ever serializes the analyzer registry — module-level functions of a
    test module are not importable on executors."""

    def _ascii_ws(text: str):
        if not text:
            return [], [], 0
        terms = [fold_ascii(w).lower() for w in text.split()]
        return terms, list(range(len(terms))), len(terms)

    return _ascii_ws


if "ascii_ws" not in ANALYZERS:
    register_analyzer("ascii_ws", _make_ascii_ws())


def parser(**kw):
    return AnalyzingQueryParser("ascii_ws", **kw)


def _leaves(q):
    if isinstance(q, Q.Boolean):
        out = []
        for sub in q.should + q.must + q.must_not:
            out.extend(_leaves(sub))
        return out
    return [q]


def _flat(q):
    """Render a parsed tree the way the reference toString reads."""
    parts = []
    for leaf in _leaves(q):
        if isinstance(leaf, Q.Term):
            parts.append(leaf.term)
        elif isinstance(leaf, Q.Prefix):
            parts.append(leaf.prefix + "*")
        elif isinstance(leaf, Q.Wildcard):
            parts.append(leaf.pattern)
        elif isinstance(leaf, Q.Fuzzy):
            parts.append(f"{leaf.term}~{leaf.max_edits}")
        else:
            parts.append(repr(leaf))
    return " ".join(parts)


def test_wildcards():  # testWildCardQuery / wildcardExpected:66-69
    p = parser(allow_leading_wildcard=True)
    assert _flat(p.parse("*bersetzung über*ung")) == "*bersetzung uber*ung"
    assert _flat(p.parse("Mötley Crüe Mötl?* Crü?")) == "motley crue motl?* cru?"
    assert _flat(p.parse("Renée Zellweger Ren?? Zellw?ger")) == (
        "renee zellweger ren?? zellw?ger"
    )


def test_prefixes():  # testPrefixQuery / prefixExpected:71-74
    p = parser()
    assert _flat(p.parse("übersetzung übersetz*")) == "ubersetzung ubersetz*"
    assert _flat(p.parse("Mötley Crüe Mötl* crü*")) == "motley crue motl* cru*"
    assert _flat(p.parse("René? Zellw*")) == "rene? zellw*"


def test_ranges():  # testRangeQuery / rangeExpected:76-77
    p = parser()
    q = p.parse("[aa TO bb]")
    assert isinstance(q, Q.TermRange)
    assert (q.lower, q.upper, q.include_lower, q.include_upper) == (
        "aa", "bb", True, True
    )
    q = p.parse("{Anaïs TO Zoé}")
    assert (q.lower, q.upper, q.include_lower, q.include_upper) == (
        "anais", "zoe", False, False
    )


def test_fuzzy():  # testFuzzyQuery / fuzzyExpected:79-87
    p = parser()
    assert _flat(p.parse("Übersetzung Übersetzung~0.9")) == (
        "ubersetzung ubersetzung~1"
    )
    assert _flat(p.parse("Mötley Crüe Mötley~0.75 Crüe~0.5")) == (
        "motley crue motley~1 crue~2"
    )
    assert _flat(p.parse("Renée Zellweger Renée~0.9 Zellweger~")) == (
        "renee zellweger renee~0 zellweger~2"
    )


def test_wildcard_escapes():  # testWildCardEscapes: escaped chars gobbled
    p = parser()
    # "mö\*tl*y": the escaped * stays inside the analyzed chunk; only the
    # bare * is a wildcard boundary
    q = p.parse(r"mö\*tl*y")
    assert isinstance(q, Q.Wildcard) and q.pattern == r"mo\*tl*y"
    # escaped backslash then true wildcard
    q = p.parse("mö\\\\*tley")
    assert isinstance(q, Q.Wildcard) and q.pattern == "mo\\\\*tley"
    # escaped wildcard then true wildcard
    q = p.parse(r"mö\??ley")
    assert isinstance(q, Q.Wildcard) and q.pattern == r"mo\??ley"


def test_leading_wildcard_not_allowed():  # testWildCardQueryNoLeadingAllowed
    with pytest.raises(ValueError):
        parser().parse("*bersetzung")


def test_single_chunk_exceptions():  # testSingleChunkExceptions:106-130
    # analyzer returning nothing for a chunk
    def _empty(text):
        return [], [], 0

    if "null_an" not in ANALYZERS:
        register_analyzer("null_an", _empty)
    with pytest.raises(ValueError, match="returned nothing"):
        AnalyzingQueryParser("null_an").parse("fieldX*")
    # analyzer producing multiple terms for one chunk
    def _multi(text):
        return ["t1", "t2"], [0, 1], 2

    if "multi_an" not in ANALYZERS:
        register_analyzer("multi_an", _multi)
    with pytest.raises(ValueError, match="multiple terms"):
        AnalyzingQueryParser("multi_an").parse("hello*")


def test_float_to_edits_reference_clamps():
    """Review r5: FuzzyQuery.floatToEdits — sims >= 1 use min(int(sim), 2)
    even with a decimal point; integers clamp to 2."""
    p = parser()
    assert p.parse("roam~1.5").max_edits == 1
    assert p.parse("roam~1.0").max_edits == 1
    assert p.parse("roam~3").max_edits == 2
    assert p.parse("roam~0").max_edits == 0
