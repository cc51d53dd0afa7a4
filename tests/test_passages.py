"""PostingsHighlighter analog: sentence passages + PassageScorer shape."""

import pytest

from lucene_solr_intervals_spark.search import queries as Q


@pytest.fixture(scope="module")
def searcher(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search.executor import Searcher

    corpus = spark.createDataFrame(
        [
            (
                0,
                "alpha beta here. nothing to see. alpha alpha beta. "
                "just filler words.",
            ),
            (1, "no match at all. still nothing."),
            (2, "alpha only sentence."),
        ],
        ["doc_id", "text"],
    )
    idx = build_index(corpus, analyzer="code")
    s = Searcher(idx, corpus=corpus, mode="sql")
    yield s
    idx.unpersist()


def test_sentence_passages_ranked(searcher):
    rows = searcher.highlight_passages(
        Q.Boolean(should=(Q.Term("alpha"), Q.Term("beta"))), k=3, n_passages=2
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: best passage is the double-alpha sentence — same token count as
    # the single-alpha one (equal length norm), higher alpha tf wins
    p0 = sorted(by_doc[0], key=lambda r: r["passage_rank"])
    assert "alpha alpha beta" in p0[0]["snippet"]
    assert p0[0]["passage_score"] > p0[1]["passage_score"]
    # snippets are real sentence substrings
    assert p0[0]["snippet"].strip().endswith(".")
    # unmatched sentences are never emitted as passages
    for r in rows:
        assert "nothing" not in r["snippet"] and "filler" not in r["snippet"]
    # doc 1 has no query match -> no passages
    assert 1 not in by_doc
    assert len(by_doc[2]) == 1


def test_passage_offsets_align(searcher):
    rows = searcher.highlight_passages(Q.Term("alpha"), k=3, n_passages=1).collect()
    text0 = "alpha beta here. nothing to see. alpha alpha beta. just filler words."
    for r in rows:
        if r["doc_id"] == 0:
            assert text0[r["offset_begin"] : r["offset_end"]] == r["snippet"]
