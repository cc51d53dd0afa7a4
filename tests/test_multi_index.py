"""Distributed scatter-gather: sharded search == unsharded search, exactly.

The invariant distributed IDF exists for (Solr ExactStatsCache /
QueryComponent.mergeIds): identical (df, N, avgdl, doclen, tf) inputs on
every shard -> identical scores and merge order as one big index.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sharded(spark, tmp_path_factory):
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import build_segments

    root = tmp_path_factory.mktemp("shards")
    corpus = generate_corpus(spark, 600).persist()
    corpus.count()
    single = str(root / "single")
    s1 = str(root / "shard1")
    s2 = str(root / "shard2")
    build_segments(corpus, single, n_segments=6, id_col="doc_id",
                   text_col="content", n_docs_hint=600)
    # doc-id ranges stay GLOBAL and disjoint across shards
    build_segments(corpus.where(F.col("doc_id") < 300), s1, n_segments=3,
                   id_col="doc_id", text_col="content", n_docs_hint=300)
    build_segments(corpus.where(F.col("doc_id") >= 300), s2, n_segments=3,
                   id_col="doc_id", text_col="content", n_docs_hint=300)
    yield corpus, single, [s1, s2]
    corpus.unpersist()


def test_global_stats_match_single_index(spark, sharded):
    from lucene_solr_intervals_spark.search.multi import MultiIndexSearcher
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    _, single, shards = sharded
    one = SegmentSearcher(spark, single)
    multi = MultiIndexSearcher(spark, shards)
    assert multi.n_docs == one.n_docs
    assert multi.avgdl == pytest.approx(one.avgdl)
    terms = ["get_index", "merge_posting"]
    assert multi._global_weights(terms) == one._weights(terms)


def test_sharded_topk_equals_single(spark, sharded):
    from lucene_solr_intervals_spark.search.multi import MultiIndexSearcher
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    _, single, shards = sharded
    one = SegmentSearcher(spark, single)
    multi = MultiIndexSearcher(spark, shards)
    for terms, conj in [
        (["get_index", "merge_posting"], False),
        (["get_index", "merge_posting"], True),
        (["flush_segment"], False),
    ]:
        a = [(r["doc_id"], r["score"])
             for r in one.search(terms, k=10, conjunctive=conj).collect()]
        b = [(r["doc_id"], r["score"])
             for r in multi.search(terms, k=10, conjunctive=conj).collect()]
        assert a == b, (terms, conj)


def test_distributed_count(spark, sharded):
    from lucene_solr_intervals_spark.analysis.tokenizer import code_tokenize
    from lucene_solr_intervals_spark.search.multi import MultiIndexSearcher

    corpus, _single, shards = sharded
    multi = MultiIndexSearcher(spark, shards)
    terms = ["get_index", "merge_posting"]
    got_or = multi.count(terms)
    got_and = multi.count(terms, conjunctive=True)
    # ground truth straight from the corpus text
    want_or = want_and = 0
    for r in corpus.select("content").collect():
        toks = set(code_tokenize(r["content"])[0])
        hit = sum(t in toks for t in terms)
        want_or += hit > 0
        want_and += hit == 2
    assert got_or == want_or
    assert got_and == want_and


def test_count_plan_has_no_explode_or_distinct(spark, sharded):
    """The round-3 count shape (python list-comp -> explode -> distinct)
    is gone: counting happens inside the per-segment cogroup kernel and
    only per-segment scalar rows are aggregated."""
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    _corpus, single, _shards = sharded
    ss = SegmentSearcher(spark, single)
    postings = ss.postings.where(ss.postings.term.isin(["get_index"]))
    # reproduce the count plan without collecting
    import pandas as pd
    from pyspark.sql import functions as F

    # use the public API but capture the plan of the per-seg aggregate
    # by rebuilding the same frame count() aggregates over
    plan_probe = (
        postings.groupBy("seg")
        .cogroup(ss.norms.groupBy("seg"))
        .applyInPandas(
            lambda pdf, npdf: pd.DataFrame({"n": [len(pdf)]}),
            "n long",
        )
        .agg(F.sum("n"))
    )
    plan = plan_probe._jdf.queryExecution().executedPlan().toString()
    assert "Explode" not in plan
    assert "Distinct" not in plan and "distinct" not in plan
    # and the real count still answers correctly through the same shape
    assert ss.count(["get_index"]) > 0
