"""Core analyzer chains (KeywordAnalyzer / SimpleAnalyzer / StopAnalyzer
roles) + the register_analyzer extension point.

Reference: analysis/core/KeywordAnalyzer.java:28, SimpleAnalyzer.java:31,
LetterTokenizer.java:36, StopAnalyzer.java:51-55.
"""

from lucene_solr_intervals_spark.analysis.tokenizer import (
    ANALYZERS,
    keyword_tokenize,
    letter_tokenize,
    register_analyzer,
)


def test_keyword_whole_input_one_token():
    terms, pos, dl = keyword_tokenize("Foo Bar-42 baz")
    assert terms == ["Foo Bar-42 baz"] and pos == [0] and dl == 1
    assert keyword_tokenize("") == ([], [], 0)


def test_simple_letter_runs_lowercased():
    # LetterTokenizer: maximal letter runs; digits/punct split
    terms, pos, dl = ANALYZERS["simple"]("Foo42Bar, baz-QUX")
    assert terms == ["foo", "bar", "baz", "qux"]
    assert pos == [0, 1, 2, 3] and dl == 4


def test_stop_analyzer_position_holes():
    terms, pos, dl = ANALYZERS["stop"]("the quick fox is fast")
    # 'the' and 'is' removed, positions keep holes
    assert terms == ["quick", "fox", "fast"]
    assert pos == [1, 2, 4] and dl == 3


def test_language_stop_chains():
    fr, _, _ = ANALYZERS["fr"]("le chat et la souris")
    assert fr == ["chat", "souris"]
    de, _, _ = ANALYZERS["de"]("der Hund und die Katze")
    assert de == ["hund", "katze"]


def test_register_analyzer_extension_point():
    register_analyzer("rev_test", lambda s: letter_tokenize(s[::-1]))
    try:
        terms, _, _ = ANALYZERS["rev_test"]("abc xyz")
        assert terms == ["zyx", "cba"]
    finally:
        ANALYZERS.pop("rev_test", None)


def test_keyword_index_roundtrip(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search import queries as Q
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(
        [(0, "US-WEST-2"), (1, "us-west-2"), (2, "EU-CENTRAL-1")],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="keyword")
    s = Searcher(idx, corpus=corpus, mode="sql")
    # keyword analyzer: exact verbatim match only
    got = sorted(r["doc_id"] for r in s.matching(Q.Term("US-WEST-2")).collect())
    assert got == [0]
    idx.unpersist()
