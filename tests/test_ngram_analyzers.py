"""NGramTokenizer + EdgeNGramTokenFilter transcriptions
(lucene/analysis/common/src/test/.../ngram/NGramTokenizerTest.java and
EdgeNGramTokenFilterTest.java)."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.analysis.ngrams import (
    edge_ngram_flat_pass,
    ngram_flat,
)
from lucene_solr_intervals_spark.analysis.tokenizer import (
    ANALYZERS,
    register_edge_ngram_analyzer,
    register_ngram_analyzer,
    tokenize_flat,
)


def grams(text, mi, ma):
    flat = ngram_flat([text], mi, ma)
    return (
        flat["terms"].tolist(),
        flat["positions"].tolist(),
        list(zip(flat["starts"].tolist(), flat["ends"].tolist())),
    )


def test_ngram_javadoc_table():  # NGramTokenizer.java:35-42 example
    terms, pos, offs = grams("abcde", 2, 3)
    assert terms == ["ab", "abc", "bc", "bcd", "cd", "cde", "de"]
    assert pos == [0, 1, 2, 3, 4, 5, 6]  # every gram posInc 1
    assert offs == [(0, 2), (0, 3), (1, 3), (1, 4), (2, 4), (2, 5), (3, 5)]


def test_ngram_unigrams():  # testUnigrams
    terms, _, _ = grams("abcde", 1, 1)
    assert terms == ["a", "b", "c", "d", "e"]


def test_ngram_bigrams():  # testBigrams
    terms, _, _ = grams("abcde", 2, 2)
    assert terms == ["ab", "bc", "cd", "de"]


def test_ngram_oversized():  # testOversizedNgrams
    assert grams("abcde", 6, 7)[0] == []


def test_ngram_keeps_whitespace():  # no trimming, spaces are chars
    terms, _, _ = grams("a b", 2, 2)
    assert terms == ["a ", " b"]


def test_ngram_invalid_sizes():
    with pytest.raises(ValueError):
        ngram_flat(["x"], 0, 1)
    with pytest.raises(ValueError):
        ngram_flat(["x"], 2, 1)


def test_edge_front_range():  # testFrontRangeOfNgrams: "abcde" @(1,3)
    import numpy as np

    flat = {
        "doc_idx": np.zeros(1, dtype=np.int64),
        "terms": np.asarray(["abcde"], dtype=object),
        "positions": np.zeros(1, dtype=np.int64),
        "starts": np.asarray([0], dtype=np.int64),
        "ends": np.asarray([5], dtype=np.int64),
        "doclens": np.asarray([1], dtype=np.int64),
    }
    out = edge_ngram_flat_pass(flat, 1, 3)
    assert out["terms"].tolist() == ["a", "ab", "abc"]
    assert out["positions"].tolist() == [0, 0, 0]
    # offsets stay the WHOLE token's span (EdgeNGramTokenFilterTest:93-95)
    assert out["starts"].tolist() == [0, 0, 0]
    assert out["ends"].tolist() == [5, 5, 5]
    assert out["doclens"].tolist() == [1]  # three overlaps -> one position


def test_edge_oversized():  # testOversizedNgrams
    import numpy as np

    flat = {
        "doc_idx": np.zeros(1, dtype=np.int64),
        "terms": np.asarray(["abcde"], dtype=object),
        "positions": np.zeros(1, dtype=np.int64),
        "doclens": np.asarray([1], dtype=np.int64),
    }
    out = edge_ngram_flat_pass(flat, 6, 6)
    assert out["terms"].tolist() == []


def test_edge_filter_positions():  # testFilterPositions: "abcde vwxyz"
    if "edge13" not in ANALYZERS:
        register_edge_ngram_analyzer("edge13", base="ws", min_gram=1, max_gram=3)
    terms, positions, doclen = ANALYZERS["edge13"]("abcde vwxyz")
    assert terms == ["a", "ab", "abc", "v", "vw", "vwx"]
    assert positions == [0, 0, 0, 1, 1, 1]  # posInc 1,0,0,1,0,0
    assert doclen == 2


def test_registered_ngram_chain_index(spark):
    """char-bigram chain through build_index: NGramPhrase over char grams
    — the pairing the rewrite was designed for."""
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search import queries as Q
    from lucene_solr_intervals_spark.search.executor import Searcher

    if "chargram2" not in ANALYZERS:
        register_ngram_analyzer("chargram2", 2, 2)
    corpus = spark.createDataFrame(
        [(0, "abcd"), (1, "abxd"), (2, "bcda")], ["doc_id", "text"]
    )
    idx = build_index(corpus, analyzer="chargram2")
    s = Searcher(idx, corpus=corpus, mode="sql")
    # phrase "abcd" == grams ab,bc,cd at consecutive positions; the rewrite
    # keeps ab + cd (slot 0 and last)
    q = Q.NGramPhrase(("ab", "bc", "cd"), n=2)
    hits = sorted(int(r["doc_id"]) for r in s.matching(q).collect())
    assert hits == [0]
    idx.unpersist()


def test_edge_autocomplete_index(spark):
    """edge-gram chain: Term('mer') matches docs containing merge-prefixed
    tokens — prefix search at term-lookup cost."""
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search import queries as Q
    from lucene_solr_intervals_spark.search.executor import Searcher

    if "edge_ac" not in ANALYZERS:
        register_edge_ngram_analyzer("edge_ac", base="code", min_gram=1, max_gram=4)
    corpus = spark.createDataFrame(
        [(0, "merge sort"), (1, "vector mercy"), (2, "table scan")],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="edge_ac")
    s = Searcher(idx, corpus=corpus, mode="sql")
    hits = sorted(int(r["doc_id"]) for r in s.matching(Q.Term("mer")).collect())
    assert hits == [0, 1]
    hits = sorted(int(r["doc_id"]) for r in s.matching(Q.Term("merg")).collect())
    assert hits == [0]
    idx.unpersist()


def test_flat_scalar_equivalence_ngrams():
    if "chargram2" not in ANALYZERS:
        register_ngram_analyzer("chargram2", 2, 2)
    texts = ["abcde", "", None, "xy", "a"]
    flat = tokenize_flat(texts, "chargram2")
    off = 0
    for i, t in enumerate(texts):
        terms, positions, doclen = ANALYZERS["chargram2"](t)
        n = len(terms)
        assert flat["terms"][off : off + n].tolist() == terms
        assert int(flat["doclens"][i]) == doclen
        off += n
    assert off == flat["terms"].size
