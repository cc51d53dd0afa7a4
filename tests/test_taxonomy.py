"""Taxonomy facets: DrillDownQuery / getTopChildren / DrillSideways analogs
(facet/DrillDownQuery.java, taxonomy/FastTaxonomyFacetCounts.java,
facet/DrillSideways.java) against a hand-checkable corpus."""

from __future__ import annotations

import pytest

from lucene_solr_intervals_spark.search.taxonomy import (
    FacetsConfig,
    drill_down,
    drill_sideways,
    facet_table,
    top_children,
)

ROWS = [
    # doc_id, source, lang
    (0, "gh", "py"),
    (1, "gh", "py"),
    (2, "gh", "rs"),
    (3, "so", "py"),
    (4, "so", "go"),
    (5, "gh", "go"),
    (6, "so", "rs"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, ["doc_id", "source", "lang"])


@pytest.fixture(scope="module")
def cfg():
    return FacetsConfig({"origin": ["source", "lang"]})


def _hits(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], ["doc_id"])


def test_facet_table_emits_every_prefix(spark, docs, cfg):
    rows = {
        (r["doc_id"], r["dim"], r["path"], r["depth"])
        for r in facet_table(docs, cfg).collect()
    }
    assert (0, "origin", "gh", 1) in rows
    assert (0, "origin", "gh/py", 2) in rows
    # one row per prefix per doc: 7 docs * 2 levels
    assert len(rows) == 14


def test_top_children_root_and_nested(spark, docs, cfg):
    hits = _hits(spark, [0, 1, 2, 3, 4, 5, 6])
    root = [(r["child"], r["n"]) for r in top_children(hits, docs, cfg, "origin").collect()]
    assert root == [("gh", 4), ("so", 3)]  # count desc, label asc
    under_gh = [
        (r["child"], r["n"])
        for r in top_children(hits, docs, cfg, "origin", path=("gh",)).collect()
    ]
    assert under_gh == [("py", 2), ("go", 1), ("rs", 1)]


def test_top_children_respects_hit_set(spark, docs, cfg):
    hits = _hits(spark, [0, 2, 6])
    under_gh = [
        (r["child"], r["n"])
        for r in top_children(hits, docs, cfg, "origin", path=("gh",)).collect()
    ]
    assert under_gh == [("py", 1), ("rs", 1)]


def test_drill_down_composes_constraints(spark, docs, cfg):
    hits = _hits(spark, [0, 1, 2, 3, 4, 5, 6])
    got = sorted(
        r["doc_id"]
        for r in drill_down(hits, docs, cfg, {"origin": ("gh", "py")}).collect()
    )
    assert got == [0, 1]
    # deeper-than-dim path is an error
    with pytest.raises(ValueError):
        drill_down(hits, docs, cfg, {"origin": ("gh", "py", "x")}).collect()


def test_drill_sideways_uses_other_dims_only(spark, docs):
    cfg2 = FacetsConfig({"origin": ["source"], "language": ["lang"]})
    hits = _hits(spark, [0, 1, 2, 3, 4, 5, 6])
    out = drill_sideways(
        hits, docs, cfg2, {"origin": ("gh",), "language": ("py",)}
    ).collect()
    got = {(r["dim"], r["child"]): r["n"] for r in out}
    # language sideways: lang counts with source=gh applied (NOT lang=py)
    assert got[("language", "py")] == 2
    assert got[("language", "rs")] == 1
    assert got[("language", "go")] == 1
    # origin sideways: source counts with lang=py applied (NOT source=gh)
    assert got[("origin", "gh")] == 2
    assert got[("origin", "so")] == 1


def test_sum_associations(spark, docs, cfg):
    from pyspark.sql import functions as F

    from lucene_solr_intervals_spark.search.taxonomy import sum_associations

    weighted = docs.withColumn(
        "views", (F.col("doc_id") + 1) * 10
    )
    hits = _hits(spark, [0, 1, 2, 3, 4, 5, 6])
    got = [
        (r["child"], r["total"])
        for r in sum_associations(
            hits, weighted, cfg, "origin", value_col="views", path=("gh",)
        ).collect()
    ]
    # gh docs: 0(10) 1(20) py=30; 2(30) rs=30; 5(60) go=60 -> total desc, label asc
    assert got == [("go", 60), ("py", 30), ("rs", 30)]


def test_sampled_top_children_scales_counts(spark, docs, cfg):
    from lucene_solr_intervals_spark.search.taxonomy import sampled_top_children

    # fraction 1.0 must equal exact counting (deterministic degenerate case)
    hits = _hits(spark, [0, 1, 2, 3, 4, 5, 6])
    got = {
        r["child"]: r["n_est"]
        for r in sampled_top_children(
            hits, docs, cfg, "origin", fraction=1.0
        ).collect()
    }
    assert got == {"gh": 4, "so": 3}
    # a real sample returns a subset with scaled counts, never negatives
    est = sampled_top_children(hits, docs, cfg, "origin", fraction=0.5).collect()
    assert all(r["n_est"] >= 0 for r in est)
