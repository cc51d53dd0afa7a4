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
