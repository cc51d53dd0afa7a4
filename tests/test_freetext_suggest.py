"""FreeTextSuggester analog: bigram LM + stupid backoff.

Reference: suggest/analyzing/FreeTextSuggester.java (ALPHA=0.4 backoff,
seen-set dedup across orders at :443).
"""

import pytest


@pytest.fixture(scope="module")
def model(spark):
    from lucene_solr_intervals_spark.search.suggest import build_freetext_model

    corpus = spark.createDataFrame(
        [
            (0, "hash table lookup"),
            (1, "hash table insert"),
            (2, "hash map lookup"),
            (3, "sorted table scan"),
            (4, "hash table resize"),
        ],
        ["doc_id", "text"],
    )
    m = build_freetext_model(corpus, "text").persist()
    m.count()
    yield m
    m.unpersist()


def test_gram_counts(model):
    rows = {(r["ord"], r["ctx"], r["token"]): r["cnt"] for r in model.collect()}
    assert rows[(1, "", "hash")] == 4
    assert rows[(1, "", "table")] == 4
    assert rows[(2, "hash", "table")] == 3
    assert rows[(2, "hash", "map")] == 1
    assert (2, "lookup", "hash") not in rows  # no cross-doc bigrams


def test_bigram_scoring_and_backoff(model):
    from lucene_solr_intervals_spark.search.suggest import suggest_free_text

    got = [(r["suggestion"], r["score"]) for r in
           suggest_free_text(model, "hash", k=3).collect()]
    # count(hash, table)/count(hash) = 3/4; (hash, map) = 1/4
    assert got[0][0] == "table" and got[0][1] == pytest.approx(0.75)
    assert got[1][0] == "map" and got[1][1] == pytest.approx(0.25)
    # third suggestion comes from the unigram backoff at ALPHA * cnt/tot
    assert got[2][1] == pytest.approx(0.4 * 4 / 15)  # 'hash' itself, cnt 4 of 15


def test_prefix_completion(model):
    from lucene_solr_intervals_spark.search.suggest import suggest_free_text

    got = [r["suggestion"] for r in
           suggest_free_text(model, "hash", prefix="ta", k=5).collect()]
    assert got == ["table"]


def test_backoff_dedup(model):
    from lucene_solr_intervals_spark.search.suggest import suggest_free_text

    rows = suggest_free_text(model, "hash", k=20).collect()
    names = [r["suggestion"] for r in rows]
    assert len(names) == len(set(names))  # seen-set dedup across orders


def test_unknown_context_pure_backoff(model):
    from lucene_solr_intervals_spark.search.suggest import suggest_free_text

    rows = suggest_free_text(model, "zzz", k=3).collect()
    assert rows, "unigram backoff must still suggest"
    # all scores are backoff-scaled unigram probabilities
    for r in rows:
        assert r["score"] <= 0.4
