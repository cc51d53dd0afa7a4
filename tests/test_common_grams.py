"""CommonGramsFilterTest transcriptions (commongrams/CommonGramsFilterTest
.java) — the full s/n truth tables for both the index filter and the
query filter.  Common words: of, the, s."""

from __future__ import annotations

import numpy as np

from lucene_solr_intervals_spark.analysis.shingles import common_grams_flat_pass

COMMON = frozenset({"of", "the", "s"})


def run(text, query_mode=False):
    toks = text.split()
    flat = {
        "doc_idx": np.zeros(len(toks), dtype=np.int64),
        "terms": np.asarray(toks, dtype=object),
        "positions": np.arange(len(toks), dtype=np.int64),
        "doclens": np.asarray([len(toks)], dtype=np.int64),
    }
    out = common_grams_flat_pass(flat, COMMON, query_mode=query_mode)
    incs, prev = [], -1
    for p in out["positions"].tolist():
        incs.append(p - prev if p != prev else 0)
        if p != prev:
            prev = p
    return out["terms"].tolist(), incs


def test_filter_one_word():  # testCommonGramsFilter:171-173
    assert run("the") == (["the"], [1])
    assert run("foo") == (["foo"], [1])


def test_filter_two_words():
    assert run("brown fox") == (["brown", "fox"], [1, 1])
    assert run("the fox") == (["the", "the_fox", "fox"], [1, 0, 1])
    assert run("fox of") == (["fox", "fox_of", "of"], [1, 0, 1])
    assert run("of the") == (["of", "of_the", "the"], [1, 0, 1])


def test_filter_three_word_truth_table():
    assert run("quick brown fox") == (["quick", "brown", "fox"], [1, 1, 1])
    assert run("quick brown the") == (
        ["quick", "brown", "brown_the", "the"], [1, 1, 0, 1]
    )
    assert run("quick the fox") == (
        ["quick", "quick_the", "the", "the_fox", "fox"], [1, 0, 1, 0, 1]
    )
    assert run("fox of the") == (
        ["fox", "fox_of", "of", "of_the", "the"], [1, 0, 1, 0, 1]
    )
    assert run("the quick brown") == (
        ["the", "the_quick", "quick", "brown"], [1, 0, 1, 1]
    )
    assert run("the fox of") == (
        ["the", "the_fox", "fox", "fox_of", "of"], [1, 0, 1, 0, 1]
    )
    assert run("of the fox") == (
        ["of", "of_the", "the", "the_fox", "fox"], [1, 0, 1, 0, 1]
    )
    assert run("of the of") == (
        ["of", "of_the", "the", "the_of", "of"], [1, 0, 1, 0, 1]
    )


def test_query_filter_truth_table():  # testCommonGramsQueryFilter:91-159
    q = lambda t: run(t, query_mode=True)[0]  # noqa: E731
    assert q("brown fox") == ["brown", "fox"]
    assert q("the fox") == ["the_fox"]
    assert q("fox of") == ["fox_of"]
    assert q("of the") == ["of_the"]
    assert q("the") == ["the"]
    assert q("foo") == ["foo"]
    assert q("quick brown fox") == ["quick", "brown", "fox"]
    assert q("quick brown the") == ["quick", "brown_the"]
    assert q("quick the brown") == ["quick_the", "the_brown"]
    assert q("fox of the") == ["fox_of", "of_the"]
    assert q("the quick brown") == ["the_quick", "quick", "brown"]
    assert q("the fox of") == ["the_fox", "fox_of"]
    assert q("of the fox") == ["of_the", "the_fox"]
    assert q("of the of") == ["of_the", "the_of"]


def test_query_filter_edge_cases():  # testLastWordisStopWord etc:263-293
    q = lambda t: run(t, query_mode=True)[0]  # noqa: E731
    assert q("dog the") == ["dog_the"]
    assert q("the dog") == ["the_dog"]
    assert q("the the") == ["the_the"]


def test_multi_doc_no_cross_doc_grams():
    flat = {
        "doc_idx": np.asarray([0, 1], dtype=np.int64),
        "terms": np.asarray(["fox", "the"], dtype=object),
        "positions": np.asarray([0, 0], dtype=np.int64),
        "doclens": np.asarray([1, 1], dtype=np.int64),
    }
    out = common_grams_flat_pass(flat, COMMON)
    assert out["terms"].tolist() == ["fox", "the"]


def test_registered_chain_index(spark):
    """Index-mode chain through build_index: the bigram term replaces the
    stopword-phrase positional lookup (pairs with CommonTermsQuery)."""
    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ANALYZERS,
        register_common_grams_analyzer,
    )
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search import queries as Q
    from lucene_solr_intervals_spark.search.executor import Searcher

    if "cg_e2e" not in ANALYZERS:
        register_common_grams_analyzer("cg_e2e", {"the", "of"}, base="code")
    corpus = spark.createDataFrame(
        [(0, "the fox jumps"), (1, "a fox the hound"), (2, "fox the jumps")],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="cg_e2e")
    s = Searcher(idx, corpus=corpus, mode="sql")
    hits = sorted(int(r["doc_id"]) for r in s.matching(Q.Term("the_fox")).collect())
    assert hits == [0]
    hits = sorted(int(r["doc_id"]) for r in s.matching(Q.Term("fox_the")).collect())
    assert hits == [1, 2]
    # unigrams still present; doclen discounts the stacked grams
    dl = {int(r["doc_id"]): int(r["doclen"]) for r in idx.docs.collect()}
    assert dl == {0: 3, 1: 4, 2: 3}
    idx.unpersist()


def test_query_mode_phrase_equals_gram_lookup(spark):
    """The CommonGrams pairing end-to-end: analyzing the QUERY phrase
    'the fox' through the query-mode chain yields the single gram
    'the_fox', and its term lookup on the index-mode index matches
    exactly the docs where the phrase occurs."""
    from lucene_solr_intervals_spark.analysis.tokenizer import (
        ANALYZERS,
        register_common_grams_analyzer,
    )
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search import queries as Q
    from lucene_solr_intervals_spark.search.executor import Searcher

    if "cg_e2e" not in ANALYZERS:
        register_common_grams_analyzer("cg_e2e", {"the", "of"}, base="code")
    if "cg_query" not in ANALYZERS:
        register_common_grams_analyzer(
            "cg_query", {"the", "of"}, base="code", query_mode=True
        )
    corpus = spark.createDataFrame(
        [(0, "the fox jumps"), (1, "a fox the hound"), (2, "near the fox den")],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="cg_e2e")
    s = Searcher(idx, corpus=corpus, mode="sql")
    qterms, _, _ = ANALYZERS["cg_query"]("the fox")
    assert qterms == ["the_fox"]
    hits = sorted(
        int(r["doc_id"]) for r in s.matching(Q.Term(qterms[0])).collect()
    )
    # phrase "the fox" occurs in docs 0 and 2
    assert hits == [0, 2]
    idx.unpersist()
