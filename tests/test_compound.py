"""TestCompoundWordTokenFilter.java transcriptions (reference
lucene/analysis/common/src/test/.../compound/TestCompoundWordTokenFilter.java)
against analysis/compound.py.  The Danish hyphenation grammar is the
reference's own test fixture (da_UTF8.xml, Apache-FOP-format public TeX
patterns) read in place; hyphenation tests skip if the file is absent."""

from __future__ import annotations

import os

import pytest

from lucene_solr_intervals_spark.analysis.compound import (
    HyphenationTree,
    compound_stream,
    register_compound_analyzer,
)

DA_XML = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/compound/da_UTF8.xml"
)

needs_da = pytest.mark.skipif(
    not os.path.exists(DA_XML), reason="reference da_UTF8.xml not available"
)


@pytest.fixture(scope="module")
def da_tree():
    if not os.path.exists(DA_XML):
        pytest.skip("reference da_UTF8.xml not available")
    return HyphenationTree.from_xml(DA_XML)


def ws(text):
    out, i = [], 0
    for part in text.split(" "):
        if part:
            out.append((part, 1, i, i + len(part)))
        i += len(part) + 1
    return out


def unpack(stream):
    toks = list(stream)
    return (
        [t for t, _pi, _s, _e in toks],
        [pi for _t, pi, _s, _e in toks],
        [s for _t, _pi, s, _e in toks],
        [e for _t, _pi, _s, e in toks],
    )


# ------------------------------------------------------- hyphenation mode
@needs_da
def test_hyphenation_compound_words_da(da_tree):
    terms, incs, _s, _e = unpack(compound_stream(
        ws("min veninde som er lidt af en læsehest"),
        {"læse", "hest"}, da_tree,
    ))
    assert terms == ["min", "veninde", "som", "er", "lidt", "af", "en",
                     "læsehest", "læse", "hest"]
    assert incs == [1, 1, 1, 1, 1, 1, 1, 1, 0, 0]


@needs_da
def test_hyphenation_compound_words_de_longest_match(da_tree):
    terms, incs, _s, _e = unpack(compound_stream(
        ws("basketballkurv"),
        {"basketball", "basket", "ball", "kurv"}, da_tree,
        max_sub=40, only_longest=True,
    ))
    assert terms == ["basketballkurv", "basketball", "ball", "kurv"]
    assert incs == [1, 0, 0, 0]


@needs_da
@pytest.mark.parametrize("mn,mx,want", [
    (2, 4, ["basketballkurv", "ba", "sket", "bal", "ball", "kurv"]),
    (4, 6, ["basketballkurv", "basket", "sket", "ball", "lkurv", "kurv"]),
    (4, 10, ["basketballkurv", "basket", "basketbal", "basketball", "sket",
             "sketbal", "sketball", "ball", "ballkurv", "lkurv", "kurv"]),
])
def test_hyphenation_only(da_tree, mn, mx, want):
    terms, _i, _s, _e = unpack(compound_stream(
        ws("basketballkurv"), None, da_tree, min_sub=mn, max_sub=mx,
    ))
    assert terms == want


@needs_da
def test_hyphenation_points(da_tree):
    # the interior odd-value points behind every vector above
    assert da_tree.hyphenate("basketballkurv") == [0, 2, 6, 9, 10, 14]


# -------------------------------------------------------- dictionary mode
SE_DICT = {"Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar",
           "Pelar", "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare",
           "Gesäll", "Sko", "Vind", "Rute", "Torkare", "Blad"}


def test_dumb_compound_words_se():
    text = ("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
            "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
            "Skomakare Vindrutetorkare Vindrutetorkarblad abba")
    terms, incs, starts, ends = unpack(compound_stream(ws(text), SE_DICT))
    assert terms == [
        "Bildörr", "Bil", "dörr", "Bilmotor", "Bil", "motor",
        "Biltak", "Bil", "tak", "Slagborr", "Slag", "borr",
        "Hammarborr", "Hammar", "borr", "Pelarborr", "Pelar", "borr",
        "Glasögonfodral", "Glas", "ögon", "fodral",
        "Basfiolsfodral", "Bas", "fiol", "fodral",
        "Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral", "makare",
        "gesäll", "Skomakare", "Sko", "makare",
        "Vindrutetorkare", "Vind", "rute", "torkare",
        "Vindrutetorkarblad", "Vind", "rute", "blad", "abba",
    ]
    assert incs == [1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1,
                    0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 0, 0,
                    1, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1]
    # subwords carry the ORIGINAL token's offsets
    assert starts[:6] == [0, 0, 0, 8, 8, 8]
    assert ends[:6] == [7, 7, 7, 16, 16, 16]
    assert (starts[-1], ends[-1]) == (156, 160)


def test_dumb_compound_words_se_longest_match():
    d = (SE_DICT - {"Fiol"}) | {"Fiols", "Fiolsfodral"}
    terms, incs, _s, _e = unpack(compound_stream(
        ws("Basfiolsfodralmakaregesäll"), d, only_longest=True,
    ))
    assert terms == ["Basfiolsfodralmakaregesäll", "Bas", "fiolsfodral",
                     "fodral", "makare", "gesäll"]
    assert incs == [1, 0, 0, 0, 0, 0]


def test_token_ending_with_word_component_of_minimum_length():
    terms, incs, _s, _e = unpack(compound_stream(
        ws("abcdef"), {"ab", "cd", "ef"},
    ))
    assert terms == ["abcdef", "ab", "cd", "ef"]
    assert incs == [1, 0, 0, 0]


def test_word_component_with_less_than_minimum_length():
    # "d" is shorter than minSubwordSize -> never emitted
    terms, incs, _s, _e = unpack(compound_stream(
        ws("abcdefg"), {"abc", "d", "efg"},
    ))
    assert terms == ["abcdefg", "abc", "efg"]
    assert incs == [1, 0, 0]


def test_short_word_passes_untouched():
    # len < minWordSize (5): no decomposition attempted
    terms, _i, _s, _e = unpack(compound_stream(ws("bil"), SE_DICT))
    assert terms == ["bil"]


def test_empty_and_nonletter_hyphenation(da_tree=None):
    t = HyphenationTree()
    t.add_class("aA")
    t.add_pattern("a1a")
    assert t.hyphenate("") is None
    assert t.hyphenate("a1") is None  # digit not in any class


def test_exception_list():
    t = HyphenationTree()
    for g in ("aA", "sS", "oO", "cC", "iI", "tT", "eE"):
        t.add_class(g)
    t.add_exception("as-so-ciate")
    assert t.hyphenate("associate") == [0, 2, 4, 9]


# ----------------------------------------------------------- analyzer SPI
def test_register_compound_analyzer():
    from lucene_solr_intervals_spark.analysis.tokenizer import ANALYZERS

    register_compound_analyzer("se_compound_test", SE_DICT)
    toks, positions, n = ANALYZERS["se_compound_test"]("Bildörr abba")
    assert toks == ["bildörr", "bil", "dörr", "abba"]
    assert positions == [0, 0, 0, 1]
    assert n == 4
