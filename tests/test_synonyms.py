"""TestSynonymMapFilter transcriptions (no Spark needed).

Golden cases transcribed from /root/reference/lucene/analysis/common/src/
test/org/apache/lucene/analysis/synonym/TestSynonymMapFilter.java — each
asserts the exact emitted term sequence and position-increment sequence of
the classic SynonymFilter (stacked outputs, greedy parse, collapsed empty
slots, end-hanging outputs)."""

from __future__ import annotations

import numpy as np

from lucene_solr_intervals_spark.analysis.synonyms import (
    SynonymMap,
    discounted_lengths,
    synonym_flat_pass,
    synonym_token_stream,
)


def _map(*rules):
    m = SynonymMap()
    for inp, out, keep in rules:
        m.add(inp, out, keep)
    return m


def run(m, text):
    return synonym_token_stream(text.split(), m)


def test_dont_keep_orig():  # testDontKeepOrig:146
    m = _map(("a b", "foo", False))
    assert run(m, "a b c") == (["foo", "c"], [1, 1])


def test_do_keep_orig():  # testDoKeepOrig:171
    m = _map(("a b", "foo", True))
    assert run(m, "a b c") == (["a", "foo", "b", "c"], [1, 0, 1, 1])


BASIC = _map(
    ("a", "foo", True),
    ("a b", "bar fee", True),
    ("b c", "dog collar", True),
    ("c d", "dog harness holder extras", True),
    ("m c e", "dog barks loudly", False),
    ("i j k", "feep", True),
    ("e f", "foo bar", False),
    ("e f", "baz bee", False),
    ("z", "boo", False),
    ("y", "bee", True),
)


def test_basic_abc():  # testBasic:196 verify("a b c", "a/bar b/fee c")
    assert run(BASIC, "a b c") == (["a", "bar", "b", "fee", "c"], [1, 0, 1, 0, 1])


def test_basic_hangs_past_end():  # verify("x a b c d", ...)
    terms, incs = run(BASIC, "x a b c d")
    assert terms == ["x", "a", "bar", "b", "fee", "c", "dog", "d", "harness", "holder", "extras"]
    assert incs == [1, 1, 0, 1, 0, 1, 0, 1, 0, 1, 1]


def test_basic_two_outputs_same_input():  # e f has two rules, both stacked
    terms, incs = run(BASIC, "e f")
    assert terms == ["foo", "baz", "bar", "bee"]
    assert incs == [1, 0, 1, 0]


def test_basic2_vanishing():  # testBasic2:647 (keepOrig=false)
    m = _map(("aaa", "aaaa1 aaaa2 aaaa3", False), ("bbb", "bbbb1 bbbb2", False))
    assert run(m, "xyzzy bbb pot of gold") == (
        ["xyzzy", "bbbb1", "pot", "bbbb2", "of", "gold"],
        [1, 1, 1, 0, 1, 1],
    )
    assert run(m, "xyzzy aaa pot of gold") == (
        ["xyzzy", "aaaa1", "pot", "aaaa2", "of", "aaaa3", "gold"],
        [1, 1, 1, 0, 1, 0, 1],
    )


def test_vanishing_terms_solr_parser():  # testVanishingTerms:620
    m = SynonymMap.parse_solr("aaa => aaaa1 aaaa2 aaaa3\nbbb => bbbb1 bbbb2\n")
    assert run(m, "xyzzy bbb pot of gold")[0] == [
        "xyzzy", "bbbb1", "pot", "bbbb2", "of", "gold",
    ]
    assert run(m, "xyzzy aaa pot of gold")[0] == [
        "xyzzy", "aaaa1", "pot", "aaaa2", "of", "aaaa3", "gold",
    ]


MATCHING = _map(  # testMatching:678, keepOrig=false
    ("a b", "ab", False),
    ("a c", "ac", False),
    ("a", "aa", False),
    ("b", "bb", False),
    ("z x c v", "zxcv", False),
    ("x c", "xc", False),
)


def test_matching():
    assert run(MATCHING, "$") == (["$"], [1])
    assert run(MATCHING, "a") == (["aa"], [1])
    assert run(MATCHING, "b") == (["bb"], [1])
    assert run(MATCHING, "a $") == (["aa", "$"], [1, 1])
    assert run(MATCHING, "$ a") == (["$", "aa"], [1, 1])
    assert run(MATCHING, "a a") == (["aa", "aa"], [1, 1])
    assert run(MATCHING, "z x c v") == (["zxcv"], [1])
    assert run(MATCHING, "z x c $") == (["z", "xc", "$"], [1, 1, 1])


INCLUDE_ORIG = _map(  # testIncludeOrig:824, keepOrig=true
    ("a b", "ab", True),
    ("a c", "ac", True),
    ("a", "aa", True),
    ("b", "bb", True),
    ("z x c v", "zxcv", True),
    ("x c", "xc", True),
)


def test_include_orig():
    assert run(INCLUDE_ORIG, "$") == (["$"], [1])
    assert run(INCLUDE_ORIG, "a") == (["a", "aa"], [1, 0])
    assert run(INCLUDE_ORIG, "$ a") == (["$", "a", "aa"], [1, 1, 0])
    assert run(INCLUDE_ORIG, "a $") == (["a", "aa", "$"], [1, 0, 1])
    assert run(INCLUDE_ORIG, "$ a !") == (["$", "a", "aa", "!"], [1, 1, 0, 1])
    assert run(INCLUDE_ORIG, "a a") == (["a", "aa", "a", "aa"], [1, 0, 1, 0])
    assert run(INCLUDE_ORIG, "b") == (["b", "bb"], [1, 0])
    assert run(INCLUDE_ORIG, "z x c v") == (
        ["z", "zxcv", "x", "c", "v"],
        [1, 0, 1, 1, 1],
    )
    assert run(INCLUDE_ORIG, "z x c $") == (
        ["z", "x", "xc", "c", "$"],
        [1, 1, 0, 1, 1],
    )


def test_recursion():  # testRecursion:761
    m = _map(("zoo", "zoo", False))
    assert run(m, "zoo zoo $ zoo") == (["zoo"] * 2 + ["$", "zoo"], [1, 1, 1, 1])


def test_recursion2():  # testRecursion2:779
    m = _map(("zoo", "zoo", False), ("zoo", "zoo zoo", False))
    terms, incs = run(m, "zoo zoo $ zoo")
    assert terms == ["zoo", "zoo", "zoo", "zoo", "zoo", "$", "zoo", "zoo", "zoo", "zoo"]
    assert incs == [1, 0, 1, 0, 0, 1, 0, 1, 0, 1]


def test_recursion3():  # testRecursion3:930
    m = _map(("zoo zoo", "zoo", True))
    assert run(m, "zoo zoo $ zoo") == (
        ["zoo", "zoo", "zoo", "$", "zoo"],
        [1, 0, 1, 1, 1],
    )


def test_recursion4():  # testRecursion4
    m = _map(("zoo zoo", "zoo", True), ("zoo", "zoo zoo", True))
    assert run(m, "zoo zoo $ zoo") == (
        ["zoo", "zoo", "zoo", "$", "zoo", "zoo", "zoo"],
        [1, 0, 1, 1, 1, 0, 1],
    )


def test_output_hangs_off_end():  # testOutputHangsOffEnd:799
    m = _map(("a", "a b", False))
    assert run(m, "a") == (["a", "b"], [1, 1])


def test_multiword_offsets():  # testMultiwordOffsets
    m = _map(("national hockey league", "nhl", True))
    text = "national hockey league"
    toks, s, e = [], [], []
    off = 0
    for w in text.split():
        toks.append(w)
        s.append(off)
        e.append(off + len(w))
        off += len(w) + 1
    flat = {
        "doc_idx": np.zeros(3, dtype=np.int64),
        "terms": np.asarray(toks, dtype=object),
        "positions": np.arange(3, dtype=np.int64),
        "starts": np.asarray(s, dtype=np.int64),
        "ends": np.asarray(e, dtype=np.int64),
    }
    out = synonym_flat_pass(flat, m)
    assert out["terms"].tolist() == ["national", "nhl", "hockey", "league"]
    assert out["starts"].tolist() == [0, 0, 9, 16]
    assert out["ends"].tolist() == [8, 22, 15, 22]
    assert out["positions"].tolist() == [0, 0, 1, 2]


def test_greedy_longest_wins():  # SynonymFilter.java:47-62 javadoc example
    m = _map(("a", "x", False), ("a b", "y", False), ("b c d", "z", False))
    # "a b c d e" parses to "y b c d e" — rule 2 wins at the earliest start
    assert run(m, "a b c d e") == (["y", "c", "d", "e"], [1, 1, 1, 1])


def test_multi_doc_no_bleed():
    """End-hanging output of doc 0 must not land in doc 1."""
    m = _map(("a", "x y", False))
    flat = {
        "doc_idx": np.asarray([0, 1, 1], dtype=np.int64),
        "terms": np.asarray(["a", "q", "r"], dtype=object),
        "positions": np.asarray([0, 0, 1], dtype=np.int64),
    }
    out = synonym_flat_pass(flat, m)
    assert out["doc_idx"].tolist() == [0, 0, 1, 1]
    assert out["terms"].tolist() == ["x", "y", "q", "r"]
    assert out["positions"].tolist() == [0, 1, 0, 1]


def test_discounted_lengths():
    m = _map(("a", "aa", True))
    flat = {
        "doc_idx": np.asarray([0, 0, 0], dtype=np.int64),
        "terms": np.asarray(["a", "b", "c"], dtype=object),
        "positions": np.arange(3, dtype=np.int64),
    }
    out = synonym_flat_pass(flat, m)
    assert out["terms"].tolist() == ["a", "aa", "b", "c"]
    # 4 emitted tokens, 1 overlap -> discounted length 3
    dl = discounted_lengths(out["doc_idx"], out["positions"], 1)
    assert dl.tolist() == [3]


def test_solr_parser_expand():
    m = SynonymMap.parse_solr("# comment\nfast, quick, rapid\n")
    # expand=True: each term maps to all three (itself included)
    terms, incs = run(m, "fast car")
    assert terms == ["fast", "quick", "rapid", "car"]
    assert incs == [1, 0, 0, 1]


def test_solr_parser_no_expand():
    m = SynonymMap.parse_solr("fast, quick, rapid\n", expand=False)
    assert run(m, "quick car") == (["fast", "car"], [1, 1])


def test_wordnet_parser():
    m = SynonymMap.parse_wordnet(
        "s(100000001,1,'woods',n,1,0).\n"
        "s(100000001,2,'wood',n,1,0).\n"
        "s(100000001,3,'forest',n,1,0).\n"
    )
    terms, incs = run(m, "forest fire")
    assert terms == ["forest", "wood", "woods", "fire"] or terms == [
        "woods", "wood", "forest", "fire",
    ]
    assert incs == [1, 0, 0, 1]


# ---- TestSolrSynonymParser / TestMultiWordSynonyms transcriptions ----


def test_solr_parser_simple():  # TestSolrSynonymParser.testSimple
    m = SynonymMap.parse_solr(
        "i-pod, ipod, ipoooood\n"
        "foo => foo bar\n"
        "foo => baz\n"
        "this test, that testing"
    )
    assert run(m, "ball") == (["ball"], [1])
    assert run(m, "i-pod") == (["i-pod", "ipod", "ipoooood"], [1, 0, 0])
    assert run(m, "foo") == (["foo", "baz", "bar"], [1, 0, 1])
    assert run(m, "this test") == (
        ["this", "that", "test", "testing"],
        [1, 0, 1, 0],
    )


def test_solr_parser_invalid_double_map():  # testInvalidDoubleMap
    import pytest

    with pytest.raises(ValueError):
        SynonymMap.parse_solr("a => b => c")


def test_multi_word_no_partial_match():  # TestMultiWordSynonyms
    m = SynonymMap.parse_solr("a b c,d")
    # "a e" must pass through untouched — no partial multi-word matching
    assert run(m, "a e") == (["a", "e"], [1, 1])


# ---- randomized shadow-implementation check (testRandom:384 strategy) ----


def _shadow_synonyms(tokens, syn):
    """Independent slow re-implementation of the slot semantics, written
    directly from the SynonymFilter behavioral spec (greedy longest match,
    output word j stacked on slot start+j, orig-first emission per slot,
    empty slots collapse).  The numpy pass must agree on every input."""
    n = len(tokens)
    by_first = {}
    for inp in syn.rules:
        by_first.setdefault(inp[0], set()).add(len(inp))
    matches = []
    i = 0
    while i < n:
        best = None
        for k in sorted(by_first.get(tokens[i], ()), reverse=True):
            if i + k <= n and tuple(tokens[i : i + k]) in syn.rules:
                best = k
                break
        if best is None:
            i += 1
        else:
            matches.append((i, best, syn.rules[tuple(tokens[i : i + best])]))
            i += best
    slots = {}  # slot -> {"orig": tok|None, "out": [terms]}
    for s, tok in enumerate(tokens):
        slots[s] = {"orig": tok, "out": []}
    dropped = set()
    for start, k, (keep, outputs) in matches:
        if not keep:
            dropped.update(range(start, start + k))
        for out in outputs:
            for j, w in enumerate(out):
                slots.setdefault(start + j, {"orig": None, "out": []})["out"].append(w)
    terms, incs = [], []
    pos = -1
    pending = 1
    for s in sorted(slots):
        emit = []
        o = slots[s]
        if o["orig"] is not None and s not in dropped:
            emit.append(o["orig"])
        emit.extend(o["out"])
        if not emit:
            continue  # collapsed slot
        pos += 1
        terms.append(emit[0])
        incs.append(pending)
        pending = 1
        for w in emit[1:]:
            terms.append(w)
            incs.append(0)
    return terms, incs


def test_random_rules_match_shadow():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.sampled_from(list("abcdefg"))
    phrase = st.lists(word, min_size=1, max_size=3).map(lambda w: " ".join(w))

    @settings(max_examples=300, deadline=None)
    @given(
        rules=st.lists(
            st.tuples(phrase, phrase, st.booleans()), min_size=0, max_size=6
        ),
        stream=st.lists(word, min_size=0, max_size=12),
    )
    def check(rules, stream):
        m = SynonymMap()
        for inp, out, keep in rules:
            m.add(inp, out, keep)
        got = run(m, " ".join(stream)) if stream else ([], [])
        want = _shadow_synonyms(stream, m)
        assert got == want, (rules, stream, got, want)

    check()


def test_syn_chain_rejects_holey_base():
    import pytest

    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ANALYZERS,
        _SYN_CHAINS,
        register_synonym_analyzer,
        tokenize_flat,
    )

    try:
        register_synonym_analyzer(
            "syn_bad_base", SynonymMap.parse_solr("a, b"), base="code_stop"
        )
        with pytest.raises(ValueError, match="position holes"):
            tokenize_flat(["the a fox"], "syn_bad_base")
    finally:
        _SYN_CHAINS.pop("syn_bad_base", None)
        ANALYZERS.pop("syn_bad_base", None)


def test_shingle_chain_rejects_holey_base():
    import pytest

    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ANALYZERS,
        _SHINGLE_CHAINS,
        register_shingle_analyzer,
        tokenize_flat,
    )

    try:
        register_shingle_analyzer("sh_bad_base", base="code_stop")
        with pytest.raises(ValueError, match="position holes"):
            tokenize_flat(["the quick fox"], "sh_bad_base")
    finally:
        _SHINGLE_CHAINS.pop("sh_bad_base", None)
        ANALYZERS.pop("sh_bad_base", None)
