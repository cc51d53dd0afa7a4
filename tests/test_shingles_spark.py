"""Shingled-field index end-to-end + the NGramPhraseQuery pairing.

ShingleFilter (token n-grams) is the index-side producer NGramPhraseQuery
was designed to pair with (NGramPhraseQuery.java:33): a k-token phrase
over a bigram-shingled field becomes a (k-1)-shingle gapped phrase, and
the rewrite keeps only every 2nd shingle plus the last."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.analysis.tokenizer import (
    ANALYZERS,
    register_shingle_analyzer,
)
from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search import queries as Q
from lucene_solr_intervals_spark.search.executor import Searcher

DOCS = [
    (0, "fast vector window merge scan"),
    (1, "vector window fast merge"),       # phrase broken after "window"
    (2, "slow vector window merge"),
    (3, "vector merge window scan"),
]


@pytest.fixture(scope="module")
def shingled(spark):
    if "shingle_e2e" not in ANALYZERS:
        register_shingle_analyzer("shingle_e2e", base="code")
    corpus = spark.createDataFrame(DOCS, ["doc_id", "text"])
    idx = build_index(corpus, analyzer="shingle_e2e")
    s = Searcher(idx, corpus=corpus, mode="sql")
    yield idx, s
    idx.unpersist()


def test_shingle_postings_positions(shingled):
    idx, _ = shingled
    rows = {
        int(r["doc_id"]): list(r["positions"])
        for r in idx.postings.where(idx.postings.term == "vector window").collect()
    }
    assert rows == {0: [1], 1: [0], 2: [1]}
    # unigrams still present at their slots
    uni = {
        int(r["doc_id"]): list(r["positions"])
        for r in idx.postings.where(idx.postings.term == "window").collect()
    }
    assert uni == {0: [2], 1: [1], 2: [2], 3: [2]}


def test_single_shingle_term_replaces_phrase(shingled):
    _, s = shingled
    # one term lookup == the 2-term positional phrase on a plain field
    hits = sorted(
        int(r["doc_id"]) for r in s.matching(Q.Term("vector window")).collect()
    )
    assert hits == [0, 1, 2]


def test_ngram_phrase_rewrite_over_shingles(shingled):
    _, s = shingled
    # phrase "vector window merge" -> shingles ("vector window",
    # "window merge"); NGramPhrase(n=2) keeps slot 0 + last
    q = Q.NGramPhrase(("vector window", "window merge"), n=2)
    assert [t for t, _ in q.kept_slots()] == ["vector window", "window merge"]
    hits = sorted(int(r["doc_id"]) for r in s.matching(q).collect())
    assert hits == [0, 2]
    # 4-token phrase: 3 shingles, the middle one is skipped by the rewrite
    q4 = Q.NGramPhrase(
        ("fast vector", "vector window", "window merge"), n=2
    )
    assert [t for t, _ in q4.kept_slots()] == [("fast vector")] + ["window merge"]
    hits = sorted(int(r["doc_id"]) for r in s.matching(q4).collect())
    assert hits == [0]


def test_shingle_doclen_is_base_token_count(shingled):
    idx, _ = shingled
    dl = {int(r["doc_id"]): int(r["doclen"]) for r in idx.docs.collect()}
    assert dl == {0: 5, 1: 4, 2: 4, 3: 4}
    # sum_ttf counts unigrams + shingles: 17 + 13
    assert idx.sum_ttf == 17 + 13
