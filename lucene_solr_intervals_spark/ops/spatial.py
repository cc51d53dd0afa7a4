"""Spatial search analogs (lucene/spatial module).

The reference offers three strategies (SpatialStrategy.java:43): BBox
(bbox/BBoxStrategy — four numeric range fields), PointVector
(vector/PointVectorStrategy — two numeric fields + distance ValueSource),
and RecursivePrefixTree (prefix/RecursivePrefixTreeStrategy — geohash-cell
terms for indexed shapes).  In Spark these map to:

  bbox_filter      native column ranges — Catalyst pushdown does the work
                   the trie-encoded numeric fields did (like NumericRange)
  distance_filter  great-circle (haversine) predicate + distance sort,
                   entirely JVM-side expressions (no UDF) — the
                   PointVector distance ValueSource
  geohash          prefix-tree cell id per point: equi-join key for
                   spatial self-joins / neighbor blocking at scale (join
                   on cell + neighbor cells instead of a cross join), the
                   RecursivePrefixTree role

All functions take plain lat/lon double columns.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # mean Earth radius (DistanceUtils convention)

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km, built-in functions only."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def bbox_filter(
    df: DataFrame, min_lat: float, max_lat: float, min_lon: float, max_lon: float,
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """BBoxStrategy analog: pure range predicates, pushdown-friendly."""
    return df.where(
        (F.col(lat_col) >= min_lat)
        & (F.col(lat_col) <= max_lat)
        & (F.col(lon_col) >= min_lon)
        & (F.col(lon_col) <= max_lon)
    )


def distance_filter(
    df: DataFrame, lat: float, lon: float, radius_km: float,
    lat_col: str = "lat", lon_col: str = "lon",
) -> DataFrame:
    """PointVectorStrategy distance query: a cheap bounding-box prefilter
    (the strategy's own optimization) then the exact haversine predicate;
    adds a `distance_km` column for sorting/scoring."""
    import math

    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    dlon = dlat / max(math.cos(math.radians(lat)), 1e-9)
    boxed = bbox_filter(
        df, lat - dlat, lat + dlat, lon - dlon, lon + dlon, lat_col, lon_col
    )
    dist = haversine_km(F.col(lat_col), F.col(lon_col), F.lit(lat), F.lit(lon))
    # distance_km keeps FULL float64 precision: pre-rounding here caused a
    # double-rounding defect (round(round(x,4),2) != round(x,2) exactly at
    # .xx5 boundaries — surfaced by the sf1 scale point, doc 6684 at
    # 748.98496 -> 748.985 -> 748.99 vs the oracle's 748.98); display
    # rounding is the consumer's concern
    return boxed.withColumn("_d", dist).where(F.col("_d") <= radius_km).select(
        *df.columns, F.col("_d").alias("distance_km")
    )


def geohash_py(lat: float, lon: float, precision: int = 6) -> str:
    """Standard geohash (the prefix-tree cell id), pure Python reference."""
    lat_rng, lon_rng = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lon_rng[0] + lon_rng[1]) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_rng[0] = mid
            else:
                ch <<= 1
                lon_rng[1] = mid
        else:
            mid = (lat_rng[0] + lat_rng[1]) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_rng[0] = mid
            else:
                ch <<= 1
                lat_rng[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(_BASE32[ch])
            bits, ch = 0, 0
    return "".join(out)


def with_geohash(
    df: DataFrame, precision: int = 6, lat_col: str = "lat", lon_col: str = "lon",
    out_col: str = "geohash",
) -> DataFrame:
    """RecursivePrefixTree role: one cell-id column per point.  Arrow-batched
    (geohash is bit twiddling, not worth a JVM UDF round-trip to avoid)."""
    from pyspark.sql.functions import pandas_udf

    p = precision

    @pandas_udf("string")
    def _gh(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            [geohash_py(a, b, p) for a, b in zip(lat, lon)], dtype="object"
        )

    return df.withColumn(out_col, _gh(F.col(lat_col), F.col(lon_col)))


# ------------------------------------------------- recursive prefix tree ---
# RecursivePrefixTreeStrategy (lucene/spatial/src/java/org/apache/lucene/
# spatial/prefix/RecursivePrefixTreeStrategy.java:43): a query shape is
# covered by grid cells of VARYING depth — coarse cells where the shape
# fully contains them (one short term matches everything beneath it), fine
# cells along the boundary (matched approximately, then verified).  Here
# the grid is the geohash tree (32-way, GeohashPrefixTree role); the cover
# is computed driver-side (pure geometry, no data touched) and applied as
# prefix predicates over the point's geohash column.


def geohash_bounds(cell: str) -> tuple[float, float, float, float]:
    """(min_lat, max_lat, min_lon, max_lon) of a geohash cell."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for ch in cell:
        idx = _BASE32.index(ch)
        for bit in (16, 8, 4, 2, 1):
            if even:
                mid = (lon_lo + lon_hi) / 2
                if idx & bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if idx & bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lat_lo, lat_hi, lon_lo, lon_hi


def cover_bbox(
    min_lat: float, max_lat: float, min_lon: float, max_lon: float,
    max_precision: int = 6, max_cells: int = 256,
) -> tuple[list[str], list[str]]:
    """Cover a bbox with geohash cells of varying depth (the recursive
    descent of RecursivePrefixTreeStrategy's AbstractVisitingPrefixTreeFilter).

    Returns (within, boundary): `within` cells lie FULLY inside the shape
    (every point under them matches — no verification needed), `boundary`
    cells intersect the edge at max_precision (candidates needing the
    exact predicate).  Descends only into intersecting cells; stops
    splitting when the cell budget is reached (coarser cells become
    boundary cells, trading verification work for term count — the
    prefixGridScanLevel knob)."""
    within: list[str] = []
    boundary: list[str] = []

    def contains(b) -> bool:
        return (
            b[0] >= min_lat and b[1] <= max_lat
            and b[2] >= min_lon and b[3] <= max_lon
        )

    def intersects(b) -> bool:
        return not (
            b[1] < min_lat or b[0] > max_lat or b[3] < min_lon or b[2] > max_lon
        )

    frontier = [""]
    while frontier:
        nxt: list[str] = []
        for parent in frontier:
            for ch in _BASE32:
                cell = parent + ch
                b = geohash_bounds(cell)
                if not intersects(b):
                    continue
                if contains(b):
                    within.append(cell)
                elif len(cell) >= max_precision:
                    boundary.append(cell)
                else:
                    nxt.append(cell)
        if len(within) + len(boundary) + len(nxt) > max_cells:
            boundary.extend(nxt)  # budget hit: keep coarse, verify more
            break
        frontier = nxt
    return within, boundary


def shape_intersects(
    df: DataFrame,
    min_lat: float, max_lat: float, min_lon: float, max_lon: float,
    geohash_col: str = "geohash",
    lat_col: str = "lat", lon_col: str = "lon",
    max_precision: int = 6, max_cells: int = 256,
) -> DataFrame:
    """INTERSECTS query via the prefix tree: points under a `within` cell
    match by prefix alone; points under a `boundary` cell pass through the
    exact predicate (the strategy's approximate-match-then-verify).  The
    cell cover is an OR of startswith predicates — a bounded set of range
    scans over a geohash-sorted layout, never a full-table exact pass."""
    from collections import defaultdict

    within, boundary = cover_bbox(
        min_lat, max_lat, min_lon, max_lon, max_precision, max_cells
    )
    gh = F.col(geohash_col)
    exact = (
        (F.col(lat_col) >= min_lat) & (F.col(lat_col) <= max_lat)
        & (F.col(lon_col) >= min_lon) & (F.col(lon_col) <= max_lon)
    )
    # group cells by depth: one substring(gh, 1, depth) IN (cells) predicate
    # per depth (a handful of hash-set probes, not a per-cell OR chain —
    # a left-deep Column tree of hundreds of startswith overflows Catalyst)
    by_len: dict[int, list[str]] = defaultdict(list)
    for c in within:
        by_len[len(c)].append(c)
    cond = F.lit(False)
    for length, cells in sorted(by_len.items()):
        cond = cond | F.substring(gh, 1, length).isin(cells)
    bby_len: dict[int, list[str]] = defaultdict(list)
    for c in boundary:
        bby_len[len(c)].append(c)
    for length, cells in sorted(bby_len.items()):
        cond = cond | (F.substring(gh, 1, length).isin(cells) & exact)
    # safety net: a stored geohash SHORTER than the deepest cover cell can
    # never equal those cells' prefixes (substring returns the short hash),
    # so such rows fall back to the exact predicate instead of silently
    # dropping — with_geohash(precision=5) vs a depth-6 cover stays correct
    deepest = max(list(by_len) + list(bby_len), default=0)
    if deepest:
        cond = cond | ((F.length(gh) < deepest) & exact)
    return df.where(cond)
