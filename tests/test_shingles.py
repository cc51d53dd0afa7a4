"""ShingleFilterTest transcriptions (no Spark needed).

Golden cases transcribed from /root/reference/lucene/analysis/common/src/
test/org/apache/lucene/analysis/shingle/ShingleFilterTest.java — exact
term sequences, position increments and character offsets of the
reference ShingleFilter over "please divide this sentence into shingles"
(with and without stopword holes)."""

from __future__ import annotations

from lucene_solr_intervals_spark.analysis.tokenizer import _shingle_flat

TEXT = "please divide this sentence into shingles"
HOLES = frozenset({"this", "into"})


def sh(text, stop=None, **params):
    flat = _shingle_flat([text], "ws", stop, params, True)
    incs, prev = [], -1
    for p in flat["positions"].tolist():
        incs.append(p - prev)
        prev = p
    return (
        flat["terms"].tolist(),
        incs,
        list(zip(flat["starts"].tolist(), flat["ends"].tolist())),
    )


def test_bigram():  # testBiGramFilter / BI_GRAM_TOKENS
    terms, incs, offs = sh(TEXT)
    assert terms == [
        "please", "please divide", "divide", "divide this", "this",
        "this sentence", "sentence", "sentence into", "into",
        "into shingles", "shingles",
    ]
    assert incs == [1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1]
    # NB: the reference's TEST_TOKEN fixture cans shingles=(33,39), but the
    # real word "shingles" ends at 41 — we tokenize real text, so the last
    # ends read 41; every other offset matches the canned values.
    assert offs == [
        (0, 6), (0, 13), (7, 13), (7, 18), (14, 18), (14, 27), (19, 27),
        (19, 32), (28, 32), (28, 41), (33, 41),
    ]


def test_bigram_with_holes():  # BI_GRAM_TOKENS_WITH_HOLES
    terms, incs, offs = sh(TEXT, HOLES)
    assert terms == [
        "please", "please divide", "divide", "divide _", "_ sentence",
        "sentence", "sentence _", "_ shingles", "shingles",
    ]
    assert incs == [1, 0, 1, 0, 1, 1, 0, 1, 1]
    assert offs == [
        (0, 6), (0, 13), (7, 13), (7, 19), (19, 27), (19, 27), (19, 33),
        (33, 41), (33, 41),
    ]


def test_bigram_without_unigrams():  # BI_GRAM_TOKENS_WITHOUT_UNIGRAMS
    terms, incs, _ = sh(TEXT, output_unigrams=False)
    assert terms == [
        "please divide", "divide this", "this sentence", "sentence into",
        "into shingles",
    ]
    assert incs == [1, 1, 1, 1, 1]


def test_bigram_with_holes_without_unigrams():
    terms, incs, _ = sh(TEXT, HOLES, output_unigrams=False)
    assert terms == [
        "please divide", "divide _", "_ sentence", "sentence _", "_ shingles",
    ]
    assert incs == [1, 1, 1, 1, 1]


def test_bigram_single_token():  # testBiGramFilterWithSingleToken
    assert sh("please")[0] == ["please"]
    assert sh("please", output_unigrams=False)[0] == []


def test_bigram_empty_stream():
    assert sh("")[0] == []
    assert sh("", output_unigrams=False)[0] == []


def test_trigram():  # TRI_GRAM_TOKENS
    terms, incs, _ = sh(TEXT, max_size=3)
    assert terms == [
        "please", "please divide", "please divide this",
        "divide", "divide this", "divide this sentence",
        "this", "this sentence", "this sentence into",
        "sentence", "sentence into", "sentence into shingles",
        "into", "into shingles",
        "shingles",
    ]
    assert incs == [1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 1]


def test_trigram_without_unigrams():
    terms, incs, _ = sh(TEXT, max_size=3, output_unigrams=False)
    assert terms == [
        "please divide", "please divide this",
        "divide this", "divide this sentence",
        "this sentence", "this sentence into",
        "sentence into", "sentence into shingles",
        "into shingles",
    ]
    assert incs == [1, 0, 1, 0, 1, 0, 1, 0, 1]


def test_fourgram():  # FOUR_GRAM_TOKENS
    terms, incs, _ = sh(TEXT, max_size=4)
    assert terms == [
        "please", "please divide", "please divide this",
        "please divide this sentence",
        "divide", "divide this", "divide this sentence",
        "divide this sentence into",
        "this", "this sentence", "this sentence into",
        "this sentence into shingles",
        "sentence", "sentence into", "sentence into shingles",
        "into", "into shingles",
        "shingles",
    ]
    assert incs == [1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1, 0, 1]


def test_trigram_min_trigram():  # TRI_GRAM_TOKENS_MIN_TRI_GRAM
    terms, incs, _ = sh(TEXT, min_size=3, max_size=3)
    assert terms == [
        "please", "please divide this",
        "divide", "divide this sentence",
        "this", "this sentence into",
        "sentence", "sentence into shingles",
        "into",
        "shingles",
    ]
    assert incs == [1, 0, 1, 0, 1, 0, 1, 0, 1, 1]


def test_fourgram_min_trigram():  # FOUR_GRAM_TOKENS_MIN_TRI_GRAM
    terms, incs, _ = sh(TEXT, min_size=3, max_size=4)
    assert terms == [
        "please", "please divide this", "please divide this sentence",
        "divide", "divide this sentence", "divide this sentence into",
        "this", "this sentence into", "this sentence into shingles",
        "sentence", "sentence into shingles",
        "into",
        "shingles",
    ]
    assert incs == [1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 1, 1]


def test_fourgram_min_fourgram():  # FOUR_GRAM_TOKENS_MIN_FOUR_GRAM
    terms, incs, _ = sh(TEXT, min_size=4, max_size=4)
    assert terms == [
        "please", "please divide this sentence",
        "divide", "divide this sentence into",
        "this", "this sentence into shingles",
        "sentence",
        "into",
        "shingles",
    ]
    assert incs == [1, 0, 1, 0, 1, 0, 1, 1, 1]


def test_bigram_no_separator():  # BI_GRAM_TOKENS_NO_SEPARATOR
    terms, _, _ = sh(TEXT, separator="")
    assert terms == [
        "please", "pleasedivide", "divide", "dividethis", "this",
        "thissentence", "sentence", "sentenceinto", "into", "intoshingles",
        "shingles",
    ]


def test_bigram_alt_separator():
    terms, _, _ = sh(TEXT, separator="<SEP>")
    assert terms[1] == "please<SEP>divide"


def test_trailing_hole1():  # testTrailingHole1: "wizard of"
    terms, incs, offs = sh("wizard of", frozenset({"of"}))
    assert terms == ["wizard", "wizard _"]
    assert incs == [1, 0]
    assert offs == [(0, 6), (0, 9)]


def test_trailing_hole2():  # testTrailingHole2: "purple wizard of"
    terms, incs, offs = sh("purple wizard of", frozenset({"of"}))
    assert terms == ["purple", "purple wizard", "wizard", "wizard _"]
    assert incs == [1, 0, 1, 0]
    assert offs == [(0, 6), (0, 13), (7, 13), (7, 16)]


def test_two_trailing_holes():  # "purple wizard of the"
    stop = frozenset({"of", "the"})
    terms, incs, offs = sh("purple wizard of the", stop)
    assert terms == ["purple", "purple wizard", "wizard", "wizard _"]
    assert incs == [1, 0, 1, 0]
    assert offs == [(0, 6), (0, 13), (7, 13), (7, 20)]


def test_two_trailing_holes_tri_shingle():
    stop = frozenset({"of", "the"})
    terms, incs, offs = sh("purple wizard of the", stop, max_size=3)
    assert terms == [
        "purple", "purple wizard", "purple wizard _",
        "wizard", "wizard _", "wizard _ _",
    ]
    assert incs == [1, 0, 0, 1, 0, 0]
    assert offs == [(0, 6), (0, 13), (0, 20), (7, 13), (7, 20), (7, 20)]


def test_output_unigrams_if_no_shingles():
    # testOutputUnigramsIfNoShinglesSingleTokenCase
    terms, incs, _ = sh(
        "please", output_unigrams=False, output_unigrams_if_no_shingles=True
    )
    assert terms == ["please"] and incs == [1]
    # ...WithSimpleBigram: shingles exist -> unigrams suppressed
    terms, _, _ = sh(
        "please divide", output_unigrams=False, output_unigrams_if_no_shingles=True
    )
    assert terms == ["please divide"]


def test_multi_doc_windows_stay_inside_doc():
    flat = _shingle_flat(["a b", "c d"], "ws", None, {}, False)
    assert flat["terms"].tolist() == ["a", "a b", "b", "c", "c d", "d"]
    assert flat["doc_idx"].tolist() == [0, 0, 0, 1, 1, 1]
    assert flat["doclens"].tolist() == [2, 2]


# ---- randomized shadow-implementation check ----


def _shadow_shingles(tokens, stop, min_size, max_size, output_unigrams, sep="_SEP_"):
    """Independent slow re-implementation from the behavioral spec: dense
    slots with '_' fillers, windows inside [0, L) with >= 1 real token,
    unigram-first then sizes ascending per slot, positions = slot index
    (no collapse)."""
    L = len(tokens)
    real = [t not in stop for t in tokens]
    dense = [t if r else "_" for t, r in zip(tokens, real)]
    out = []  # (slot, order, term)
    for s in range(L):
        if output_unigrams and real[s]:
            out.append((s, 0, tokens[s]))
        for k in range(min_size, max_size + 1):
            if s + k <= L and any(real[s : s + k]):
                out.append((s, k, sep.join(dense[s : s + k])))
    out.sort(key=lambda t: (t[0], t[1]))
    terms = [t for _, _, t in out]
    incs, prev = [], -1
    for s, _, _ in out:
        incs.append(s - prev if s != prev else 0)
        if s != prev:
            prev = s
    return terms, incs


def test_random_shingles_match_shadow():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from lucene_solr_intervals_spark.analysis.tokenizer import _shingle_flat

    word = st.sampled_from(list("abcdefg") + ["the", "of"])

    @settings(max_examples=300, deadline=None)
    @given(
        stream=st.lists(word, min_size=0, max_size=10),
        min_size=st.integers(2, 3),
        extra=st.integers(0, 2),
        unigrams=st.booleans(),
        with_stop=st.booleans(),
    )
    def check(stream, min_size, extra, unigrams, with_stop):
        stop = frozenset({"the", "of"}) if with_stop else frozenset()
        params = dict(
            min_size=min_size,
            max_size=min_size + extra,
            output_unigrams=unigrams,
            separator="_SEP_",
        )
        flat = _shingle_flat(
            [" ".join(stream)], "ws", stop or None, params, False
        )
        incs, prev = [], -1
        for p in flat["positions"].tolist():
            incs.append(p - prev if p != prev else 0)
            if p != prev:
                prev = p
        got = (flat["terms"].tolist(), incs)
        want = _shadow_shingles(
            stream, stop, min_size, min_size + extra, unigrams
        )
        assert got == want, (stream, params, stop, got, want)

    check()


def test_output_unigrams_if_no_shingles_is_per_document():
    """Review r5: the flag is per token stream (document), not per batch —
    a shingle-less doc keeps its unigrams even when batch-mates shingled."""
    from lucene_solr_intervals_spark.analysis.tokenizer import _shingle_flat

    flat = _shingle_flat(
        ["a", "x y"], "ws", None,
        dict(output_unigrams=False, output_unigrams_if_no_shingles=True),
        False,
    )
    assert flat["doc_idx"].tolist() == [0, 1]
    assert flat["terms"].tolist() == ["a", "x y"]
    assert flat["doclens"].tolist() == [1, 1]
