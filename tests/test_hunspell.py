"""Hunspell stemmer tests — reference suite transcriptions.

Vectors from lucene/analysis/common/src/test/.../hunspell/TestStemmer.java,
TestCondition, TestOptionalCondition, TestCircumfix, TestKeepCase,
TestNeedAffix, TestHomonyms, TestFlagLong, TestFlagNum, TestFullStrip,
TestComplexPrefix, TestCaseInsensitive, TestHunspellStemFilter.  The
.aff/.dic fixtures are the reference's own test data read in place
(skip when absent)."""

from __future__ import annotations

import os

import pytest

from lucene_solr_intervals_spark.analysis.hunspell import (
    HunspellDictionary,
    HunspellStemmer,
    hunspell_stem_stream,
    register_hunspell_analyzer,
)

BASE = ("/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
        "analysis/hunspell/")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(BASE), reason="reference hunspell fixtures not available"
)


def load(aff, dic, **kw):
    with open(BASE + aff) as fa, open(BASE + dic) as fd:
        return HunspellStemmer(HunspellDictionary(fa.read(), fd.read(), **kw))


def assert_stems(stemmer, word, *expected):
    assert sorted(stemmer.stem(word)) == sorted(expected), word


@pytest.fixture(scope="module")
def simple():
    return load("simple.aff", "simple.dic")


# ------------------------------------------------------------- TestStemmer
def test_simple_suffix(simple):
    assert_stems(simple, "lucene", "lucene", "lucen")
    assert_stems(simple, "mahoute", "mahout")


def test_simple_prefix(simple):
    assert_stems(simple, "solr", "olr")


def test_recursive_suffix(simple):
    # no recursion: the second suffix lacks the continuation flag
    assert_stems(simple, "abcd")


ALL_STEMS = [
    ("ab", ["ab"]), ("abc", ["ab"]), ("apach", ["apach"]),
    ("apache", ["apach"]), ("foo", ["foo", "foo"]), ("food", ["foo"]),
    ("foos", ["foo"]), ("lucen", ["lucen"]), ("lucene", ["lucen", "lucene"]),
    ("mahout", ["mahout"]), ("mahoute", ["mahout"]), ("moo", ["moo"]),
    ("mood", ["moo"]), ("olr", ["olr"]), ("solr", ["olr"]),
]
BOGUS = ["abs", "abe", "sab", "sapach", "sapache", "apachee", "sfoo",
         "sfoos", "fooss", "lucenee", "solre"]


def test_all_stems(simple):
    for w, exp in ALL_STEMS:
        assert_stems(simple, w, *exp)


def test_bogus_stems(simple):
    for w in BOGUS:
        assert_stems(simple, w)


# ------------------------------------------------ feature suites (vectors)
SUITES = {
    ("condition.aff", "condition.dic"): [
        ("hello", ["hello"]), ("try", ["try"]), ("tried", ["try"]),
        ("work", ["work"]), ("worked", ["work"]), ("rework", ["work"]),
        ("reworked", ["work"]), ("retried", []), ("workied", []),
        ("tryed", []), ("tryied", []), ("helloed", []),
    ],
    ("optional-condition.aff", "condition.dic"): [
        ("hello", ["hello"]), ("tried", ["try"]), ("worked", ["work"]),
        ("rework", ["work"]), ("reworked", ["work"]), ("retried", []),
        ("workied", []), ("tryed", []), ("tryied", []), ("helloed", []),
    ],
    ("circumfix.aff", "circumfix.dic"): [
        ("nagy", ["nagy"]), ("nagyobb", ["nagy"]), ("legnagyobb", ["nagy"]),
        ("legeslegnagyobb", ["nagy"]), ("nagyobbobb", []), ("legnagy", []),
        ("legeslegnagy", []),
    ],
    ("keepcase.aff", "keepcase.dic"): [
        ("drink", ["drink"]), ("Drink", ["drink"]), ("DRINK", ["drink"]),
        ("drinks", ["drink"]), ("Drinks", ["drink"]), ("DRINKS", ["drink"]),
        ("walk", ["walk"]), ("walks", ["walk"]), ("Walk", []),
        ("Walks", []), ("WALKS", []), ("test", ["test"]), ("Test", []),
        ("TEST", []),
    ],
    ("needaffix.aff", "needaffix.dic"): [
        ("drink", ["drink"]), ("drinks", ["drink"]), ("walk", []),
        ("walks", ["walk"]), ("prewalk", ["walk"]), ("prewalks", ["walk"]),
        ("test", []), ("pretest", []), ("tests", []), ("pretests", []),
    ],
    ("homonyms.aff", "homonyms.dic"): [("works", ["work", "work"])],
    ("flaglong.aff", "flaglong.dic"): [
        ("foo", ["foo"]), ("foos", ["foo"]), ("fooss", []), ("foobogus", []),
    ],
    ("flagnum.aff", "flagnum.dic"): [
        ("foo", ["foo"]), ("foos", ["foo"]), ("fooss", []),
    ],
    ("fullstrip.aff", "fullstrip.dic"): [("tasty", ["beer"])],
    ("complexprefix.aff", "complexprefix.dic"): [
        ("ptwofoo", ["foo"]), ("poneptwofoo", ["foo"]), ("foosuf", ["foo"]),
        ("ptwofoosuf", ["foo"]), ("poneptwofoosuf", ["foo"]),
        ("ponefoo", []), ("ponefoosuf", []), ("ptwoponefoo", []),
        ("ptwoponefoosuf", []),
    ],
}


@pytest.mark.parametrize("fixture", sorted(SUITES, key=str))
def test_feature_suite(fixture):
    stemmer = load(*fixture)
    for w, exp in SUITES[fixture]:
        assert_stems(stemmer, w, *exp)


def test_case_insensitive():
    s = load("simple.aff", "mixedcase.dic", ignore_case=True)
    for w, exp in [("lucene", ["lucene", "lucen"]),
                   ("LuCeNe", ["lucene", "lucen"]),
                   ("mahoute", ["mahout"]), ("MaHoUte", ["mahout"]),
                   ("solr", ["olr"])]:
        got = sorted(x.lower() for x in s.stem(w))
        assert got == sorted(exp), w


# --------------------------------------------------- TestHunspellStemFilter
def ws(text):
    out, i = [], 0
    for part in text.split(" "):
        if part:
            out.append((part, 1, i, i + len(part)))
        i += len(part) + 1
    return out


def test_stem_filter(simple):
    toks = list(hunspell_stem_stream(ws("lucene is awesome"), simple))
    assert [t for t, *_ in toks] == ["lucene", "lucen", "is", "awesome"]
    assert [pi for _t, pi, *_ in toks] == [1, 0, 1, 1]


def test_stem_filter_keyword(simple):
    toks = list(hunspell_stem_stream(
        ws("lucene is awesome"), simple, keyword_set=frozenset({"lucene"})
    ))
    assert [t for t, *_ in toks] == ["lucene", "is", "awesome"]


def test_stem_filter_longest_only(simple):
    toks = list(hunspell_stem_stream(
        ws("lucene is awesome"), simple, longest_only=True
    ))
    assert [t for t, *_ in toks] == ["lucene", "is", "awesome"]
    assert [pi for _t, pi, *_ in toks] == [1, 1, 1]


def test_register_analyzer(simple):
    from lucene_solr_intervals_spark.analysis.tokenizer import ANALYZERS

    register_hunspell_analyzer("hunspell_test_an", simple.d)
    toks, positions, n = ANALYZERS["hunspell_test_an"]("lucene foos")
    assert toks == ["lucene", "lucen", "foo"]
    assert positions == [0, 0, 1]
    assert n == 3


def test_iconv_oconv():
    # TestConv.java vectors (conv.aff/conv.dic)
    s = load("conv.aff", "conv.dic")
    for w, exp in [("drink", ["drInk"]), ("drInk", ["drInk"]),
                   ("drInkAble", ["drInk"]), ("drInkABle", ["drInk"]),
                   ("drinkABle", ["drInk"])]:
        assert_stems(s, w, *exp)
