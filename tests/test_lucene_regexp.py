"""Lucene RegExp dialect tests: parser + Java-regex translation semantics
pinned against RegExp.java:40-315 / Automata.makeInterval, plus a brute-force
interval-regex property check and end-to-end term expansion through Spark."""

from __future__ import annotations

import re

import pytest

from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.regexp import (
    UnsupportedRegexp,
    interval_regex,
    parse,
    to_java_regex,
)


def _match(pattern: str, s: str) -> bool:
    """Reference matcher for the regular core via Python re (Java-compatible
    subset used by the translator)."""
    return re.fullmatch("(?:" + to_java_regex(parse(pattern)) + ")", s) is not None


@pytest.mark.parametrize(
    "pattern,yes,no",
    [
        ("abc", ["abc"], ["ab", "abcd", "xabc"]),           # anchored by default
        ("ab.d", ["abcd", "abxd"], ["abd", "abccd"]),
        ("a*b", ["b", "ab", "aaab"], ["ba", "aa"]),
        ("(ab)+", ["ab", "abab"], ["", "aba"]),
        ("a{2,3}", ["aa", "aaa"], ["a", "aaaa"]),
        ("foo|bar", ["foo", "bar"], ["foobar"]),
        ("[a-c]x", ["ax", "bx", "cx"], ["dx", "x"]),
        ("[^a-c]x", ["dx", "zx"], ["ax"]),
        ('"a.c"', ["a.c"], ["abc"]),                          # quoted literal
        ("@", ["", "anything at all"], []),                   # ANYSTRING
        ("a@", ["a", "abc"], ["b"]),
        ("\\.x", [".x"], ["ax"]),                             # escaped dot
        ("a#", [], ["a", ""]),                                # empty language
    ],
)
def test_core_translation(pattern, yes, no):
    for s in yes:
        assert _match(pattern, s), (pattern, s)
    for s in no:
        assert not _match(pattern, s), (pattern, s)


@pytest.mark.parametrize("lo,hi,digits", [(0, 9, 0), (5, 23, 0), (17, 174, 0), (99, 1001, 0), (7, 7, 0), (1, 10, 2), (0, 255, 3)])
def test_interval_regex_brute_force(lo, hi, digits):
    """interval_regex == Automata.makeInterval semantics, checked by brute
    force: digits>0 fixed width zero-padded; digits==0 any leading zeros."""
    rx = re.compile("(?:" + interval_regex(lo, hi, digits) + ")$")
    for n in range(0, hi + 25):
        if digits > 0:
            s = str(n).zfill(digits)
            expect = lo <= n <= hi and len(s) == digits
            assert bool(rx.fullmatch(s)) == expect, (lo, hi, digits, s)
        else:
            for s in (str(n), "0" + str(n), "00" + str(n)):
                expect = lo <= n <= hi
                assert bool(rx.fullmatch(s)) == expect, (lo, hi, s)


def test_interval_inside_expression():
    assert _match("v<1-12>x", "v7x")
    assert _match("v<1-12>x", "v012x")  # leading zeros accepted (digits==0)
    assert not _match("v<1-12>x", "v13x")
    # same-length bounds fix the width (RegExp.java:966-967)
    assert _match("v<01-12>x", "v07x")
    assert not _match("v<01-12>x", "v7x")


def test_embedded_complement_rejected():
    with pytest.raises(UnsupportedRegexp):
        to_java_regex(parse("a~(bc)d"))
    with pytest.raises(UnsupportedRegexp):
        to_java_regex(parse("a(b&c)d"))


def test_spark_regexp_expansion(spark):
    """End to end: ~ / & / @ / <n-m> against a real term dictionary."""
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(
        [(0, "foo foobar barfoo baz v1 v2 v12 qux17")], ["doc_id", "text"]
    )
    idx = build_index(corpus, analyzer="code")
    try:
        s = Searcher(idx, mode="sql")

        def expand(pattern):
            return sorted(
                r["term"] for r in s._expand_terms(Q.Regexp(pattern)).collect()
            )

        assert expand("foo.*") == ["foo", "foobar"]
        assert expand(".*foo.*&.*bar.*") == ["barfoo", "foobar"]   # intersection
        assert expand("~(.*foo.*)") == ["baz", "qux17", "v1", "v12", "v2"]
        assert expand("foo@") == ["foo", "foobar"]                 # anystring
        assert expand("v<1-2>") == ["v1", "v2"]                    # interval
        assert expand("v<1-12>") == ["v1", "v12", "v2"]
        assert expand("foo|baz") == ["baz", "foo"]
    finally:
        idx.unpersist()
