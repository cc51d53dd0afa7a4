"""IR-quality harness tests (quality.py — QualityBenchmark.java analog).

Unit-tests the QualityStats math against hand-computed values, then runs
the full benchmark on the planted-relevance corpus and pins the expected
similarity ordering: BM25's tf saturation beats classic TF-IDF and
LM-Dirichlet on keyword-stuffed spam."""

from __future__ import annotations

import math

import pytest

from lucene_solr_intervals_spark.quality import (
    Judge,
    QualityQuery,
    average_stats,
    judge_ranked,
    quality_corpus,
    run_benchmark,
)


def test_average_precision_hand_values():
    judge = Judge({"q": {1, 2, 3}})
    # ranked: rel, non, rel, non, rel -> AP = (1/1 + 2/3 + 3/5) / 3
    st = judge_ranked("q", [1, 99, 2, 98, 3], judge)
    assert math.isclose(st.avg_precision, (1 + 2 / 3 + 3 / 5) / 3)
    assert st.recall == 1.0
    assert st.mrr == 1.0
    assert st.precision_at[1] == 1.0
    assert st.precision_at[2] == 0.5
    assert math.isclose(st.precision_at[5], 3 / 5)
    # past the result list, precision decays as good/rank
    assert math.isclose(st.precision_at[10], 3 / 10)


def test_ap_divides_by_max_recall_not_retrieved():
    # 4 relevant exist, only 2 retrieved -> AP uses /4 (TrecJudge.maxRecall)
    judge = Judge({"q": {1, 2, 3, 4}})
    st = judge_ranked("q", [1, 2], judge)
    assert math.isclose(st.avg_precision, (1 + 1) / 4)
    assert st.recall == 0.5


def test_first_relevant_rank_mrr():
    judge = Judge({"q": {5}})
    st = judge_ranked("q", [9, 8, 5], judge)
    assert math.isclose(st.mrr, 1 / 3)
    st = judge_ranked("q", [9, 8, 7], judge)
    assert st.mrr == 0.0 and st.avg_precision == 0.0


def test_average_stats():
    judge = Judge({"a": {1}, "b": {2}})
    s1 = judge_ranked("a", [1], judge)       # AP 1.0
    s2 = judge_ranked("b", [9, 2], judge)    # AP 0.5
    agg = average_stats([s1, s2])
    assert math.isclose(agg["map"], 0.75)
    assert math.isclose(agg["mrr"], 0.75)


@pytest.fixture(scope="module")
def planted(spark):
    from lucene_solr_intervals_spark.index.builder import build_index

    corpus, topics, judge = quality_corpus(spark)
    idx = build_index(corpus, analyzer="code")
    yield idx, corpus, topics, judge
    idx.unpersist()


def test_planted_corpus_similarity_ordering(planted):
    from lucene_solr_intervals_spark.search.executor import Searcher

    idx, corpus, topics, judge = planted
    maps = {}
    for name, kw in (
        ("bm25", dict(mode="sql")),
        ("classic", dict(mode="classic")),
        ("lm_dirichlet", dict(mode="sql", similarity="lm_dirichlet")),
    ):
        s = Searcher(idx, corpus=corpus, **kw)
        _, agg = run_benchmark(s, topics, judge, k=20)
        maps[name] = agg["map"]
    # BM25's saturation must defeat the keyword stuffing outright...
    assert maps["bm25"] >= 0.95, maps
    # ...and beat the weaker similarities by a wide, stable margin
    assert maps["bm25"] > maps["classic"] + 0.3, maps
    assert maps["bm25"] > maps["lm_dirichlet"] + 0.3, maps
