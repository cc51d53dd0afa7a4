"""TestMappingCharFilter.java transcriptions (reference
lucene/analysis/common/src/test/.../charfilter/TestMappingCharFilter.java)
against analysis/mapping.py.

Offsets are Python code-point offsets (the engine's convention), which
equal the reference's UTF-16 offsets for all BMP goldens; the single
non-BMP golden (U+1D122, 2 UTF-16 units but 1 code point) is adjusted
accordingly and noted inline.
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_solr_intervals_spark.analysis.mapping import (
    NormalizeCharMap,
    correct_offsets,
    mapping_filter,
    register_mapping_analyzer,
)

NORM = NormalizeCharMap({
    "aa": "a",
    "bbb": "b",
    "cccc": "cc",
    "h": "i",
    "j": "jj",
    "k": "kkk",
    "ll": "llll",
    "empty": "",
    "\U0001D122": "fclef",
    "！": "full-width-exclamation",
})


def ws_tokens_corrected(text, norm=NORM):
    out, offs, dfs = mapping_filter(text, norm)
    toks = []
    i, n = 0, len(out)
    while i < n:
        while i < n and out[i] == " ":
            i += 1
        j = i
        while j < n and out[j] != " ":
            j += 1
        if j > i:
            s, e = correct_offsets(np.array([i, j]), offs, dfs)
            toks.append((out[i:j], int(s), int(e)))
        i = j
    return toks


def test_nothing_change():
    assert ws_tokens_corrected("x") == [("x", 0, 1)]


@pytest.mark.parametrize("inp,tok,end", [
    ("h", "i", 1),        # test1to1
    ("j", "jj", 1),       # test1to2
    ("k", "kkk", 1),      # test1to3
    ("ll", "llll", 2),    # test2to4
    ("aa", "a", 2),       # test2to1
    ("bbb", "b", 3),      # test3to1
    ("cccc", "cc", 4),    # test4to2
])
def test_single_mappings(inp, tok, end):
    assert ws_tokens_corrected(inp) == [(tok, 0, end)]


def test_5to0():
    assert ws_tokens_corrected("empty") == []


def test_non_bmp_char():
    # Java golden end offset is 2 (UTF-16 units); one code point here
    assert ws_tokens_corrected("\U0001D122") == [("fclef", 0, 1)]


def test_full_width_char():
    assert ws_tokens_corrected("！") == [("full-width-exclamation", 0, 1)]


def test_token_stream():
    got = ws_tokens_corrected("h i j k ll cccc bbb aa")
    assert got == [
        ("i", 0, 1), ("i", 2, 3), ("jj", 4, 5), ("kkk", 6, 7),
        ("llll", 8, 10), ("cc", 11, 15), ("b", 16, 19), ("a", 20, 22),
    ]


def test_chained():
    # two MappingCharFilters stacked: correct through BOTH tables
    text = "aaaa ll h"
    out1, o1, d1 = mapping_filter(text, NORM)
    out2, o2, d2 = mapping_filter(out1, NORM)
    assert out2 == "a llllllll i"
    toks = []
    i, n = 0, len(out2)
    while i < n:
        while i < n and out2[i] == " ":
            i += 1
        j = i
        while j < n and out2[j] != " ":
            j += 1
        if j > i:
            mid = correct_offsets(np.array([i, j]), o2, d2)
            s, e = correct_offsets(mid, o1, d1)
            toks.append((out2[i:j], int(s), int(e)))
        i = j
    assert toks == [("a", 0, 4), ("llllllll", 5, 7), ("i", 8, 9)]


def test_match_resumes_after_replacement():
    # replacements are never re-scanned: "aa"->"a" on "aaaa" gives "aa",
    # not a fixpoint "a"
    out, _, _ = mapping_filter("aaaa", NORM)
    assert out == "aa"


def test_greedy_longest_match():
    m = NormalizeCharMap({"a": "1", "aa": "2", "aaa": "3"})
    assert mapping_filter("aaaa", m)[0] == "31"


def test_empty_pattern_rejected():
    with pytest.raises(ValueError):
        NormalizeCharMap({"": "x"})


def test_registered_analyzer_offsets_corrected(spark):
    from lucene_solr_intervals_spark.analysis.tokenizer import tokenize_flat

    register_mapping_analyzer(
        "map_demo_t", {"&": " and ", "—": " "}, base="code"
    )
    flat = tokenize_flat(["cats&dogs — fish"], "map_demo_t", keep_offsets=True)
    terms = flat["terms"].tolist()
    assert terms == ["cats", "and", "dogs", "fish"]
    # "fish" starts at original offset 12; "and" maps inside the "&"
    s = flat["starts"].tolist()
    e = flat["ends"].tolist()
    assert s[0] == 0 and e[0] == 4
    assert s[3] == 12 and e[3] == 16
