"""SimpleQueryParser parity: transcription of lucene/queryparser/src/test/
org/apache/lucene/queryparser/simple/TestSimpleQueryParser.java assertions
(whitespace+lowercase analyzer, default operator MUST, like the suite's
parse() helper at :55-64)."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.simpleparser import (
    AND_OPERATOR,
    NOT_OPERATOR,
    OR_OPERATOR,
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    PREFIX_OPERATOR,
    WHITESPACE_OPERATOR,
    SimpleQueryParser,
)


def parse(text: str, flags: int | None = None):
    kw = {} if flags is None else {"flags": flags}
    p = SimpleQueryParser(
        analyzer=lambda t: t.lower().split(), default_operator="MUST", **kw
    )
    return p.parse(text)


def T(t):  # noqa: N802
    return Q.Term(t)


def MUST(*cl):  # noqa: N802
    return Q.Boolean(must=tuple(cl))


def SHOULD(*cl):  # noqa: N802
    return Q.Boolean(should=tuple(cl))


def NOT(q):  # noqa: N802
    return Q.Boolean(should=(Q.MatchAll(),), must_not=(q,))


def test_term():
    assert parse("foobar") == T("foobar")


def test_fuzzy():
    assert parse("foobar~2") == Q.Fuzzy("foobar", max_edits=2)
    assert parse("foobar~") == T("foobar")
    assert parse("foobar~a") == T("foobar")
    assert parse("foobar~1a") == T("foobar")
    # above-max edit distance clamps to 2 (testFuzzy :96-100)
    assert parse("foo~3 bar") == MUST(Q.Fuzzy("foo", max_edits=2), T("bar"))


def test_phrase_and_slop():
    assert parse('"foo bar"') == Q.Phrase(("foo", "bar"))
    assert parse('"foo bar"~2') == Q.Phrase(("foo", "bar"), slop=2)
    assert parse('"foo bar"~10') == Q.Phrase(("foo", "bar"), slop=10)
    assert parse('"foo bar"~') == Q.Phrase(("foo", "bar"))
    assert parse('"foo bar"~a') == Q.Phrase(("foo", "bar"))
    assert parse('"foo bar"~1a') == Q.Phrase(("foo", "bar"))
    assert parse('"foo bar"~-1') == Q.Phrase(("foo", "bar"))


def test_prefix():
    assert parse("foobar*") == Q.Prefix("foobar")
    # multiple asterisks: only the trailing one is the operator
    assert parse("st*ar*") == Q.Prefix("st*ar")
    # escaped operator chars stay literal (testCrazyPrefixes2 / disguise)
    assert parse("st*ar\\\\**") == Q.Prefix("st*ar\\*")
    assert parse("sT*Ar\\\\\\*") == T("st*ar\\*")


def test_and_or_not():
    assert parse("foo+bar") == MUST(T("foo"), T("bar"))
    assert parse("foo bar") == MUST(T("foo"), T("bar"))
    assert parse('"foo bar"+"star wars"') == MUST(
        Q.Phrase(("foo", "bar")), Q.Phrase(("star", "wars"))
    )
    assert parse("foo|bar") == SHOULD(T("foo"), T("bar"))
    assert parse("foo||bar") == SHOULD(T("foo"), T("bar"))
    assert parse("-foo") == NOT(T("foo"))
    assert parse("-(foo)") == NOT(T("foo"))
    assert parse("---foo") == NOT(T("foo"))


def test_garbage_term():
    for s in (
        "star",
        "star\n",
        "star\r",
        "star\t",
        "star(",
        "star)",
        'star"',
        "\t \r\n\nstar   \n \r \t ",
        '- + "" - star \\',
    ):
        assert parse(s) == T("star"), repr(s)


def test_garbage_empty():
    for s in ("", "  ", "\\ ", "\\ \\ ", '""', '" "', '" "|" "', '(" "|" ")',
              '" " " "', '(" " " ")'):
        assert parse(s) is None, repr(s)


def test_garbage_and_or_not():
    expected = MUST(T("star"), T("wars"))
    for s in (
        "star wars",
        "star+wars",
        "     star     wars   ",
        "     star +    wars   ",
        "  |     star + + |   wars   ",
        "  |     star + + |   wars   \\",
    ):
        assert parse(s) == expected, repr(s)
    expected = SHOULD(T("star"), T("wars"))
    for s in (
        "star|wars",
        "     star |    wars   ",
        "  |     star | + |   wars   ",
        "  +     star | + +   wars   \\",
    ):
        assert parse(s) == expected, repr(s)
    for s in ("-star", "---star", "- -star -"):
        assert parse(s) == NOT(T("star")), repr(s)


def test_garbage_phrase_and_subquery():
    expected = Q.Phrase(("star", "wars"))
    for s in ('"star wars"', '"star wars\\ "', '"" | "star wars"',
              '          "star wars"        ""\\'):
        assert parse(s) == expected, repr(s)
    for s in ("(star)", "(star))", "((star)", "     -()(star)        \n\n\r     ",
              "| + - ( + - |      star    \n      ) \n"):
        assert parse(s) == T("star"), repr(s)


def test_compound_and_complex():
    assert parse("star wars empire") == MUST(T("star"), T("wars"), T("empire"))
    assert parse("star|wars|empire") == SHOULD(T("star"), T("wars"), T("empire"))
    # operator changes wrap the current tree (right-to-left precedence)
    assert parse("star|wars empire") == MUST(SHOULD(T("star"), T("wars")), T("empire"))
    assert parse("star wars | empire") == SHOULD(MUST(T("star"), T("wars")), T("empire"))
    assert parse("star wars | empire | strikes") == SHOULD(
        MUST(T("star"), T("wars")), T("empire"), T("strikes")
    )
    assert parse("star wars | empire | strikes back") == MUST(
        SHOULD(MUST(T("star"), T("wars")), T("empire"), T("strikes")), T("back")
    )
    assert parse("(star wars) | empire | (strikes back)") == SHOULD(
        MUST(T("star"), T("wars")), T("empire"), MUST(T("strikes"), T("back"))
    )
    assert parse("(star wars) | (empire | (strikes back -jarjar))") == SHOULD(
        MUST(T("star"), T("wars")),
        SHOULD(T("empire"), MUST(T("strikes"), T("back"), NOT(T("jarjar")))),
    )
    # garbage-laced variants of the same trees (the degrade-gracefully bar)
    assert parse("star| + wars + ----empire |") == MUST(
        SHOULD(T("star"), T("wars")), T("empire")
    )
    assert parse("star + | wars | ----empire +") == SHOULD(
        MUST(T("star"), T("wars")), T("empire")
    )


def test_disabled_operators():
    # with an operator masked off, its character is literal text
    assert parse('"foo bar"', flags=AND_OPERATOR | WHITESPACE_OPERATOR) == MUST(
        T('"foo'), T('bar"')
    )
    assert parse("foo*", flags=AND_OPERATOR | WHITESPACE_OPERATOR) == T("foo*")
    assert parse("foo+bar", flags=OR_OPERATOR | WHITESPACE_OPERATOR) == T("foo+bar")
    assert parse("foo|bar", flags=AND_OPERATOR | WHITESPACE_OPERATOR) == T("foo|bar")
    assert parse("-foo", flags=AND_OPERATOR | WHITESPACE_OPERATOR) == T("-foo")
    assert parse("(foo)", flags=AND_OPERATOR | WHITESPACE_OPERATOR) == T("(foo)")


def test_default_or_operator():
    p = SimpleQueryParser(analyzer=lambda t: t.lower().split())
    assert p.parse("foo bar") == SHOULD(T("foo"), T("bar"))


def test_weighted_multi_field():
    """The Map<String, Float> constructor (:129-137): each leaf expands to
    a SHOULD of per-field copies carrying the field weight (testWeightedTerm
    / testWeightedOR shapes)."""
    p = SimpleQueryParser(
        analyzer=lambda t: t.lower().split(),
        weights={"field0": 5.0, "field1": 10.0},
    )
    assert p.parse("foo") == SHOULD(
        Q.Term("foo", field="field0", boost=5.0),
        Q.Term("foo", field="field1", boost=10.0),
    )
    assert p.parse("foo|bar") == SHOULD(
        SHOULD(
            Q.Term("foo", field="field0", boost=5.0),
            Q.Term("foo", field="field1", boost=10.0),
        ),
        SHOULD(
            Q.Term("bar", field="field0", boost=5.0),
            Q.Term("bar", field="field1", boost=10.0),
        ),
    )
    assert p.parse('"foo bar"') == SHOULD(
        Q.Phrase(("foo", "bar"), field="field0", boost=5.0),
        Q.Phrase(("foo", "bar"), field="field1", boost=10.0),
    )
