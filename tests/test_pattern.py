"""Transcribed PatternReplaceCharFilter / PatternTokenizer goldens.

Vectors from the reference's own suites:
  lucene/analysis/common/src/test/org/apache/lucene/analysis/pattern/
    TestPatternReplaceCharFilter.java  (checkOutput cases: output string +
        per-index correction mapping; the assertAnalyzesTo block cases:
        token stream with original-text offsets)
    TestPatternTokenizer.java          (testSplitting group table)
"""

from __future__ import annotations

import re

import pytest

from lucene_solr_intervals_spark.analysis.pattern import (
    correct_offset,
    pattern_replace_filter,
    pattern_tokenize,
    register_pattern_replace_analyzer,
    register_pattern_tokenizer_analyzer,
)
from lucene_solr_intervals_spark.analysis.tokenizer import tokenize_flat


def _check_output(inp, pattern, replacement, expected_out, expected_indexed):
    out, offs, diffs = pattern_replace_filter(inp, re.compile(pattern), replacement)
    assert out == expected_out, (pattern, replacement, out)
    indexed = "".join(
        inp[correct_offset(i, offs, diffs)] for i in range(len(out))
    )
    assert indexed == expected_indexed, (pattern, replacement, indexed)


def test_failing_dot():
    _check_output("A. .B.", r"\.[\s]*", ".", "A..B.", "A..B.")


@pytest.mark.parametrize(
    "inp,pat,rep,out,indexed",
    [
        ("XXabcZZabcYY", "abc", "abcde", "XXabcdeZZabcdeYY", "XXabcccZZabcccYY"),
        ("XXabcabcYY", "abc", "abcde", "XXabcdeabcdeYY", "XXabcccabcccYY"),
        ("abcabcYY", "abc", "abcde", "abcdeabcdeYY", "abcccabcccYY"),
        ("YY", "^", "abcde", "abcdeYY", "YYYYYYY"),
        ("YY", "$", "abcde", "YYabcde", "YYYYYYY"),
        ("XYZ", ".", "abc", "abcabcabc", "XXXYYYZZZ"),
        ("XYZ", ".", "$0abc", "XabcYabcZabc", "XXXXYYYYZZZZ"),
    ],
)
def test_longer_replacement(inp, pat, rep, out, indexed):
    _check_output(inp, pat, rep, out, indexed)


@pytest.mark.parametrize(
    "inp,pat,rep,out,indexed",
    [
        ("XXabcZZabcYY", "abc", "xy", "XXxyZZxyYY", "XXabZZabYY"),
        ("XXabcabcYY", "abc", "xy", "XXxyxyYY", "XXababYY"),
        ("abcabcYY", "abc", "xy", "xyxyYY", "ababYY"),
        ("abcabcYY", "abc", "", "YY", "YY"),
        ("YYabcabc", "abc", "", "YY", "YY"),
    ],
)
def test_shorter_replacement(inp, pat, rep, out, indexed):
    _check_output(inp, pat, rep, out, indexed)


# --------------------------------------------------- chain-level vectors
_N = 0


def _chain(pattern, replacement, base="ws"):
    global _N
    _N += 1
    name = f"_tmp_prcf_{_N}"
    register_pattern_replace_analyzer(name, pattern, replacement, base=base)
    return name


def _run(name, text):
    flat = tokenize_flat([text], name, keep_offsets=True)
    return (
        flat["terms"].tolist(),
        flat["starts"].tolist(),
        flat["ends"].tolist(),
    )


def test_nothing_change():
    terms, starts, ends = _run(
        _chain(r"(aa)\s+(bb)\s+(cc)", "$1$2$3"), "this is test."
    )
    assert terms == ["this", "is", "test."]
    assert starts == [0, 5, 8] and ends == [4, 7, 13]


def test_replace_by_empty():
    terms, _, _ = _run(_chain(r"(aa)\s+(bb)\s+(cc)", ""), "aa bb cc")
    assert terms == []


def test_1block_1match_same_length():
    terms, starts, ends = _run(
        _chain(r"(aa)\s+(bb)\s+(cc)", "$1#$2#$3"), "aa bb cc"
    )
    assert terms == ["aa#bb#cc"] and starts == [0] and ends == [8]


def test_1block_1match_longer():
    terms, starts, ends = _run(
        _chain(r"(aa)\s+(bb)\s+(cc)", "$1##$2###$3"), "aa bb cc dd"
    )
    assert terms == ["aa##bb###cc", "dd"]
    assert starts == [0, 9] and ends == [8, 11]


def test_1block_2match_longer():
    terms, starts, ends = _run(_chain("a", "aa"), " a  a")
    assert terms == ["aa", "aa"]
    assert starts == [1, 4] and ends == [2, 5]


def test_1block_1match_shorter():
    terms, starts, ends = _run(
        _chain(r"(aa)\s+(bb)\s+(cc)", "$1#$2"), "aa  bb   cc dd"
    )
    assert terms == ["aa#bb", "dd"]
    assert starts == [0, 12] and ends == [11, 14]


def test_1block_multi_matches():
    terms, starts, ends = _run(
        _chain(r"(aa)\s+(bb)\s+(cc)", "$1  $2  $3"),
        "  aa bb cc --- aa bb aa   bb   cc",
    )
    assert terms == ["aa", "bb", "cc", "---", "aa", "bb", "aa", "bb", "cc"]
    assert starts == [2, 6, 9, 11, 15, 18, 21, 25, 29]
    assert ends == [4, 8, 10, 14, 17, 20, 23, 27, 33]


def test_2blocks_multi_matches():
    terms, starts, ends = _run(
        _chain(r"(aa)\s+(bb)", "$1##$2"),
        "  aa bb cc --- aa bb aa. bb aa   bb cc",
    )
    assert terms == ["aa##bb", "cc", "---", "aa##bb", "aa.", "bb", "aa##bb", "cc"]
    assert starts == [2, 8, 11, 15, 21, 25, 28, 36]
    assert ends == [7, 10, 14, 20, 24, 27, 35, 38]


def test_chain_composed_correction():
    # testChain: a->aa, then bb->b, then ccc->c; corrections compose
    # outermost-to-innermost, clamped >= 0 at each stage
    inp = " a bb - ccc . --- bb a . ccc ccc bb"
    o1, f1o, f1d = pattern_replace_filter(inp, re.compile("a"), "aa")
    o2, f2o, f2d = pattern_replace_filter(o1, re.compile("bb"), "b")
    o3, f3o, f3d = pattern_replace_filter(o2, re.compile("ccc"), "c")
    toks = [(m.group(0), m.start(), m.end()) for m in re.finditer(r"\S+", o3)]

    def corr(off):
        off = correct_offset(off, f3o, f3d)
        off = correct_offset(off, f2o, f2d)
        return correct_offset(off, f1o, f1d)

    assert [t for t, _, _ in toks] == [
        "aa", "b", "-", "c", ".", "---", "b", "aa", ".", "c", "c", "b"
    ]
    assert [corr(s) for _, s, _ in toks] == [
        1, 3, 6, 8, 12, 14, 18, 21, 23, 25, 29, 33
    ]
    assert [corr(e) for _, _, e in toks] == [
        2, 5, 7, 11, 13, 17, 20, 22, 24, 28, 32, 35
    ]


# ------------------------------------------------------ pattern tokenizer
@pytest.mark.parametrize(
    "group,pattern,inp,out",
    [
        (-1, "--", "aaa--bbb--ccc", "aaa bbb ccc"),
        (-1, ":", "aaa:bbb:ccc", "aaa bbb ccc"),
        (-1, r"\s", "aaa   bbb \t\tccc  ", "aaa bbb ccc"),
        (-1, ":", "boo:and:foo", "boo and foo"),
        (-1, "o", "boo:and:foo", "b :and:f"),
        (0, ":", "boo:and:foo", ": :"),
        (0, r"\'([^\']+)\'", "aaa 'bbb' 'ccc'", "'bbb' 'ccc'"),
        (1, r"\'([^\']+)\'", "aaa 'bbb' 'ccc'", "bbb ccc"),
    ],
)
def test_pattern_tokenizer_splitting(group, pattern, inp, out):
    terms, _, _, _, _ = pattern_tokenize(
        inp, re.compile(pattern), group, lowercase=False
    )
    assert " ".join(terms) == out


def test_pattern_tokenizer_chain_registered():
    register_pattern_tokenizer_analyzer("_tmp_ptok", ":", group=-1)
    flat = tokenize_flat(["Boo:And:Foo", "x:y"], "_tmp_ptok", keep_offsets=True)
    assert flat["terms"].tolist() == ["boo", "and", "foo", "x", "y"]
    assert flat["doclens"].tolist() == [3, 2]
    assert flat["starts"].tolist() == [0, 4, 8, 0, 2]
