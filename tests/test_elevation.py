"""QueryElevationComponent analog: pinned order, exclusion, forceElevation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucene_solr_intervals_spark.search.elevation import ElevationConfig, elevate


@pytest.fixture(scope="module")
def scored(spark):
    # organic order by score desc: 10, 20, 30, 40
    return spark.createDataFrame(
        [(10, 4.0), (20, 3.0), (30, 2.0), (40, 1.0)], ["doc_id", "score"]
    )


def test_elevated_pinned_in_config_order(spark, scored):
    rows = elevate(scored, [40, 30]).collect()
    assert [r["doc_id"] for r in rows] == [40, 30, 10, 20]
    assert [r["elevated"] for r in rows] == [True, True, False, False]
    # organic scores survive on elevated docs
    assert rows[0]["score"] == 1.0


def test_exclusion_and_k(spark, scored):
    rows = elevate(scored, [30], excluded_ids=[10], k=2).collect()
    assert [r["doc_id"] for r in rows] == [30, 20]


def test_force_injects_nonmatching_at_zero(spark, scored):
    corpus = spark.createDataFrame([(i,) for i in (10, 20, 30, 40, 99)], ["doc_id"])
    rows = elevate(scored, [99, 30], force=True, corpus=corpus).collect()
    assert [r["doc_id"] for r in rows][:2] == [99, 30]
    assert rows[0]["score"] == 0.0 and rows[0]["elevated"]
    # without force, an unmatched elevated id simply doesn't appear
    rows = elevate(scored, [99, 30]).collect()
    assert [r["doc_id"] for r in rows][0] == 30


def test_config_lookup():
    cfg = ElevationConfig()
    cfg.add("ipod", elevate=[1, 2], exclude=[3])
    assert cfg.lookup("ipod") == ([1, 2], [3])
    assert cfg.lookup("nothing") == ([], [])
