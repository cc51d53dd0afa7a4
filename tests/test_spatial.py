"""Spatial analogs: haversine distance filter, bbox, geohash cells."""

from __future__ import annotations

import math

import pytest

from lucene_solr_intervals_spark.ops.spatial import (
    bbox_filter,
    distance_filter,
    geohash_py,
    with_geohash,
)


def test_geohash_known_values():
    # canonical examples from the geohash spec
    assert geohash_py(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geohash_py(42.6, -5.6, 5) == "ezs42"
    assert geohash_py(0.0, 0.0, 6) == "s00000"


def test_distance_and_bbox(spark):
    rows = [
        (0, 48.8566, 2.3522),    # Paris
        (1, 51.5074, -0.1278),   # London  (~344 km from Paris)
        (2, 40.7128, -74.0060),  # New York (~5837 km)
        (3, 48.8, 2.4),          # near Paris
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lat", "lon"])
    got = {
        r["doc_id"]: r["distance_km"]
        for r in distance_filter(df, 48.8566, 2.3522, 500.0).collect()
    }
    assert set(got) == {0, 1, 3}
    assert got[0] == pytest.approx(0.0, abs=1e-6)
    assert got[1] == pytest.approx(343.6, abs=1.0)
    boxed = bbox_filter(df, 45.0, 52.0, -1.0, 5.0)
    assert sorted(r["doc_id"] for r in boxed.collect()) == [0, 1, 3]


def test_with_geohash_spark_matches_reference(spark):
    rows = [(0, 57.64911, 10.40744), (1, 42.6, -5.6), (2, -33.8688, 151.2093)]
    df = spark.createDataFrame(rows, ["doc_id", "lat", "lon"])
    got = {r["doc_id"]: r["geohash"] for r in with_geohash(df, precision=6).collect()}
    assert got == {i: geohash_py(la, lo, 6) for i, la, lo in rows}
    # prefix-tree property: truncation = coarser cell containing the point
    assert got[0].startswith(geohash_py(57.64911, 10.40744, 3))


def test_prefix_tree_shape_intersects(spark):
    """RecursivePrefixTreeStrategy analog: the varying-depth cell cover +
    boundary verification must select EXACTLY the brute-force bbox result."""
    import random

    from lucene_solr_intervals_spark.ops.spatial import (
        bbox_filter,
        cover_bbox,
        geohash_bounds,
        shape_intersects,
        with_geohash,
    )

    rng = random.Random(13)
    rows = [
        (i, rng.uniform(35.0, 45.0), rng.uniform(-80.0, -70.0))
        for i in range(400)
    ]
    df = with_geohash(
        spark.createDataFrame(rows, ["id", "lat", "lon"]), precision=6
    )
    box = (39.0, 42.5, -77.0, -72.5)
    got = sorted(r["id"] for r in shape_intersects(df, *box).collect())
    want = sorted(r["id"] for r in bbox_filter(df, *box).collect())
    assert got == want and got  # non-vacuous

    # within cells are fully contained; boundary cells genuinely straddle
    w, b = cover_bbox(*box, max_precision=5)
    for c in w:
        lo1, hi1, lo2, hi2 = geohash_bounds(c)
        assert lo1 >= box[0] and hi1 <= box[1] and lo2 >= box[2] and hi2 <= box[3]
    assert b, "expected boundary cells at this precision"
    # varying depth: a large shape covers with cells of more than one length
    w2, b2 = cover_bbox(10.0, 50.0, -120.0, -60.0, max_precision=4)
    assert len({len(c) for c in w2 + b2}) > 1


def test_shape_intersects_short_geohash_not_dropped(spark):
    """ADVICE round-4: rows whose stored geohash is COARSER than the cover
    depth must fall back to exact verification, not silently vanish."""
    import random

    from lucene_solr_intervals_spark.ops.spatial import (
        bbox_filter,
        shape_intersects,
        with_geohash,
    )

    rng = random.Random(29)
    rows = [
        (i, rng.uniform(35.0, 45.0), rng.uniform(-80.0, -70.0))
        for i in range(300)
    ]
    # stored at precision 4, cover depth defaults to 6
    df = with_geohash(
        spark.createDataFrame(rows, ["id", "lat", "lon"]), precision=4
    )
    box = (39.0, 42.5, -77.0, -72.5)
    got = sorted(r["id"] for r in shape_intersects(df, *box).collect())
    want = sorted(r["id"] for r in bbox_filter(df, *box).collect())
    assert got == want and got
