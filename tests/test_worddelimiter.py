"""TestWordDelimiterFilter.java transcriptions (reference
lucene/analysis/common/src/test/.../TestWordDelimiterFilter.java) against
analysis/worddelimiter.py, plus the analyzer-chain registration."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.analysis.worddelimiter import (
    CATENATE_ALL,
    CATENATE_NUMBERS,
    CATENATE_WORDS,
    DEFAULT_FLAGS,
    GENERATE_NUMBER_PARTS,
    GENERATE_WORD_PARTS,
    PRESERVE_ORIGINAL,
    SPLIT_ON_CASE_CHANGE,
    SPLIT_ON_NUMERICS,
    STEM_ENGLISH_POSSESSIVE,
    word_delimiter_stream,
)

ALL = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_ALL
       | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE)


def run(tokens, flags, prot=None):
    return list(word_delimiter_stream(tokens, flags, prot))


def ws_tokens(text):
    """MockTokenizer.WHITESPACE equivalent with offsets, posInc=1."""
    out, i = [], 0
    for part in text.split(" "):
        if part:
            out.append((part, 1, i, i + len(part)))
        i += len(part) + 1
    return out


# ------------------------------------------------------------- testOffsets
def test_offsets():
    got = run([("foo-bar", 1, 5, 12)], ALL)
    assert [(t, s, e) for t, _, s, e in got] == [
        ("foo", 5, 8), ("foobar", 5, 12), ("bar", 9, 12)]

    got = run([("foo-bar", 1, 5, 6)], ALL)  # illegal offsets (synonym)
    assert [(t, s, e) for t, _, s, e in got] == [
        ("foo", 5, 6), ("bar", 5, 6), ("foobar", 5, 6)]


def test_offset_change():
    got = run([("übelkeit)", 1, 7, 16)], ALL)
    assert [(t, s, e) for t, _, s, e in got] == [("übelkeit", 7, 15)]


def test_offset_change2():
    got = run([("(übelkeit", 1, 7, 17)], ALL)  # illegal
    assert [(t, s, e) for t, _, s, e in got] == [("übelkeit", 8, 17)]


def test_offset_change3():
    got = run([("(übelkeit", 1, 7, 16)], ALL)
    assert [(t, s, e) for t, _, s, e in got] == [("übelkeit", 8, 16)]


def test_offset_change4():
    got = run([("(foo,bar)", 1, 7, 16)], ALL)
    assert [(t, s, e) for t, _, s, e in got] == [
        ("foo", 8, 11), ("foobar", 8, 15), ("bar", 12, 15)]


# -------------------------------------------------------------- testSplits
@pytest.mark.parametrize("inp,out", [
    ("basic-split", ["basic", "split"]),
    ("camelCase", ["camel", "Case"]),
    ("บ้าน", ["บ้าน"]),  # Thai
    ("test's'", ["test"]),        # possessive then delimiter
    ("Роберт", ["Роберт"]),
    ("РобЕрт", ["Роб", "Ерт"]),   # russian camelCase
    ("aǅungla", ["aǅungla"]),     # composed titlecase: no split
    ("ســـــــــــــــــلام", ["ســـــــــــــــــلام"]),  # modifier letter
    ("test⃝", ["test⃝"]),          # enclosing mark
    ("हिन्दी", ["हिन्दी"]),          # combining spacing mark
    ("١٢٣٤", ["١٢٣٤"]),           # non-ascii digits
    ("𠀀𠀀", ["𠀀𠀀"]),             # supplementary characters
])
def test_splits(inp, out):
    got = run([(inp, 1, 0, len(inp))], DEFAULT_FLAGS)
    assert [t for t, _, _, _ in got] == out


def test_possessives():
    base = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
            | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS)
    got = run([("ra's", 1, 0, 4)], base | STEM_ENGLISH_POSSESSIVE)
    assert [t for t, _, _, _ in got] == ["ra"]
    got = run([("ra's", 1, 0, 4)], base)
    assert [t for t, _, _, _ in got] == ["ra", "s"]


# -------------------------------------------------- testPositionIncrements
PROT = frozenset({"NUTCH"})


def check(got, terms, starts, ends, incs):
    assert [t for t, _, _, _ in got] == terms
    assert [s for _, _, s, _ in got] == starts
    assert [e for _, _, _, e in got] == ends
    assert [p for _, p, _, _ in got] == incs


def test_position_increments_basic():
    check(run(ws_tokens("LUCENE / SOLR"), ALL, PROT),
          ["LUCENE", "SOLR"], [0, 9], [6, 13], [1, 1])
    check(run(ws_tokens("LUCENE / solR"), ALL, PROT),
          ["LUCENE", "sol", "solR", "R"],
          [0, 9, 9, 12], [6, 12, 13, 13], [1, 1, 0, 1])
    check(run(ws_tokens("LUCENE / NUTCH SOLR"), ALL, PROT),
          ["LUCENE", "NUTCH", "SOLR"], [0, 9, 15], [6, 14, 19], [1, 1, 1])


def test_position_increments_large_gap():
    def large(tokens):  # LargePosIncTokenFilter
        return [(t, 10 if t in ("largegap", "/") else p, s, e)
                for t, p, s, e in tokens]

    check(run(large(ws_tokens("LUCENE largegap SOLR")), ALL, PROT),
          ["LUCENE", "largegap", "SOLR"], [0, 7, 16], [6, 15, 20], [1, 10, 1])
    check(run(large(ws_tokens("LUCENE / SOLR")), ALL, PROT),
          ["LUCENE", "SOLR"], [0, 9], [6, 13], [1, 11])
    check(run(large(ws_tokens("LUCENE / solR")), ALL, PROT),
          ["LUCENE", "sol", "solR", "R"],
          [0, 9, 9, 12], [6, 12, 13, 13], [1, 11, 0, 1])
    check(run(large(ws_tokens("LUCENE / NUTCH SOLR")), ALL, PROT),
          ["LUCENE", "NUTCH", "SOLR"], [0, 9, 15], [6, 14, 19], [1, 11, 1])


def test_position_increments_after_stop():
    check(run(ws_tokens("lucene.solr"), ALL, PROT),
          ["lucene", "lucenesolr", "solr"],
          [0, 0, 7], [6, 11, 11], [1, 0, 1])
    # "the" removed by a stop filter -> gap carried in
    toks = [("lucene.solr", 2, 4, 15)]
    check(run(toks, ALL, PROT),
          ["lucene", "lucenesolr", "solr"],
          [4, 4, 11], [10, 15, 15], [2, 0, 1])


# ---------------------------------------------------- testLotsOfConcatenating
def test_lots_of_concatenating():
    flags = (GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | CATENATE_WORDS
             | CATENATE_NUMBERS | CATENATE_ALL | SPLIT_ON_CASE_CHANGE
             | SPLIT_ON_NUMERICS | STEM_ENGLISH_POSSESSIVE)
    check(run(ws_tokens("abc-def-123-456"), flags),
          ["abc", "abcdef", "abcdef123456", "def", "123", "123456", "456"],
          [0, 0, 0, 4, 8, 8, 12], [3, 7, 15, 7, 11, 15, 15],
          [1, 0, 0, 1, 1, 0, 1])


def test_lots_of_concatenating_preserve():
    flags = (PRESERVE_ORIGINAL | GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS
             | CATENATE_WORDS | CATENATE_NUMBERS | CATENATE_ALL
             | SPLIT_ON_CASE_CHANGE | SPLIT_ON_NUMERICS
             | STEM_ENGLISH_POSSESSIVE)
    check(run(ws_tokens("abc-def-123-456"), flags),
          ["abc-def-123-456", "abc", "abcdef", "abcdef123456", "def",
           "123", "123456", "456"],
          [0, 0, 0, 0, 4, 8, 8, 12], [15, 3, 7, 15, 7, 11, 15, 15],
          [1, 0, 0, 0, 1, 1, 0, 1])


def test_empty_term():
    # testEmptyTerm: instaneous EOF and a lone delimiter produce nothing
    assert run([], DEFAULT_FLAGS) == []
    assert run([("-", 1, 0, 1)], DEFAULT_FLAGS) == []


def test_first_token_pos_inc_never_zero():
    # "can easily happen with strange combinations (e.g. not outputting
    # numbers, but concat-all)" — first emitted token must have posInc>=1
    flags = GENERATE_WORD_PARTS | CATENATE_ALL | SPLIT_ON_NUMERICS
    got = run([("500-42", 1, 0, 6)], flags)
    assert got and got[0][1] >= 1
