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
    # filter on the exact distance; the column is rounded for display only
    return boxed.withColumn("_d", dist).where(F.col("_d") <= radius_km).select(
        *df.columns, F.round(F.col("_d"), 4).alias("distance_km")
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
