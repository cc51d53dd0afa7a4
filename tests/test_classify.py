"""Classification analogs (lucene/classification): NB must actually
discriminate separable classes; KNN majority vote sanity."""

from __future__ import annotations

from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.ops.classify import knn_classify, naive_bayes_classify
from lucene_solr_intervals_spark.search.executor import Searcher

ROWS = [
    (0, "soccer goal striker field match", "sport"),
    (1, "goal match referee soccer team", "sport"),
    (2, "striker team field soccer", "sport"),
    (3, "parliament vote election law senate", "politics"),
    (4, "senate law vote minister election", "politics"),
    (5, "election parliament minister law", "politics"),
    (6, "soccer match team goal", "sport"),
    (7, "vote senate parliament election", "politics"),
]


def test_naive_bayes_separable(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text", "label"])
    idx = build_index(df, analyzer="code")
    try:
        pred = {
            r["doc_id"]: r["predicted"]
            for r in naive_bayes_classify(idx, df.select("doc_id", "label")).collect()
        }
        want = {i: lab for i, _, lab in ROWS}
        assert pred == want  # resubstitution on separable classes is exact
    finally:
        idx.unpersist()


def test_knn_classify(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text", "label"])
    idx = build_index(df, analyzer="code")
    try:
        s = Searcher(idx, corpus=df, mode="sql")
        assert knn_classify(s, df.select("doc_id", "label"), doc_id=0, k=3) == "sport"
        assert (
            knn_classify(s, df.select("doc_id", "label"), doc_id=3, k=3) == "politics"
        )
    finally:
        idx.unpersist()
