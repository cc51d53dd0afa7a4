"""Solr date-math expressions and date range facets.

DateMathParser (solr/core/src/java/org/apache/solr/util/DateMathParser.java:95):
an expression is a base instant — ``NOW`` or an ISO-8601 literal ending in
``Z`` — followed by any sequence of operations applied left to right:

    /UNIT      round DOWN to the start of UNIT
    +N UNIT    add N units
    -N UNIT    subtract N units

Units: YEAR MONTH DAY DATE HOUR MINUTE SECOND MILLI MILLISECOND (optional
trailing S, case-insensitive).  ``NOW/DAY-7DAYS`` = midnight seven days
ago.  Month arithmetic follows calendar rules with day-of-month clamping
(Jan 31 + 1 month = Feb 29 in a leap year), like the reference's Calendar.

date_range_facets is the facet.range date mode (range.facet over a
timestamp column with date-math start/end/gap): bucket counts computed
with ONE JVM-side groupBy on the bucket ordinal — no per-bucket scan.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_ALIASES = {
    "YEAR": "YEAR", "YEARS": "YEAR",
    "MONTH": "MONTH", "MONTHS": "MONTH",
    "DAY": "DAY", "DAYS": "DAY", "DATE": "DAY",
    "HOUR": "HOUR", "HOURS": "HOUR",
    "MINUTE": "MINUTE", "MINUTES": "MINUTE",
    "SECOND": "SECOND", "SECONDS": "SECOND",
    "MILLI": "MILLI", "MILLIS": "MILLI",
    "MILLISECOND": "MILLI", "MILLISECONDS": "MILLI",
}
_OP_RE = re.compile(r"([+-]\d+[A-Za-z]+|/[A-Za-z]+)")
_DAYS_IN_MONTH = [31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _month_len(year: int, month: int) -> int:
    if month == 2 and (year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)):
        return 29
    return _DAYS_IN_MONTH[month - 1]


def _add_months(dt: datetime, n: int) -> datetime:
    m0 = dt.year * 12 + (dt.month - 1) + n
    y, m = divmod(m0, 12)
    m += 1
    return dt.replace(year=y, month=m, day=min(dt.day, _month_len(y, m)))


def _round_down(dt: datetime, unit: str) -> datetime:
    if unit == "YEAR":
        return dt.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "MONTH":
        return dt.replace(day=1, hour=0, minute=0, second=0, microsecond=0)
    if unit == "DAY":
        return dt.replace(hour=0, minute=0, second=0, microsecond=0)
    if unit == "HOUR":
        return dt.replace(minute=0, second=0, microsecond=0)
    if unit == "MINUTE":
        return dt.replace(second=0, microsecond=0)
    if unit == "SECOND":
        return dt.replace(microsecond=0)
    if unit == "MILLI":
        return dt.replace(microsecond=(dt.microsecond // 1000) * 1000)
    raise ValueError(f"unknown unit {unit!r}")


def _add(dt: datetime, unit: str, n: int) -> datetime:
    if unit == "YEAR":
        return _add_months(dt, 12 * n)
    if unit == "MONTH":
        return _add_months(dt, n)
    delta = {
        "DAY": timedelta(days=n),
        "HOUR": timedelta(hours=n),
        "MINUTE": timedelta(minutes=n),
        "SECOND": timedelta(seconds=n),
        "MILLI": timedelta(milliseconds=n),
    }[unit]
    return dt + delta


def parse_date_math(expr: str, now: datetime) -> datetime:
    """Evaluate a Solr date-math expression against `now` (naive UTC).

    Accepts ``NOW...`` or ``<ISO-8601>Z...`` bases; raises ValueError on
    malformed input (DateMathParser.java:95 parseMath)."""
    s = expr.strip()
    if s.upper().startswith("NOW"):
        base, rest = now, s[3:]
    elif "Z" in s:
        zi = s.index("Z")
        lit, rest = s[:zi], s[zi + 1 :]
        fmt = "%Y-%m-%dT%H:%M:%S.%f" if "." in lit else "%Y-%m-%dT%H:%M:%S"
        base = datetime.strptime(lit, fmt)
    else:
        raise ValueError(f"date math must start with NOW or an ISO literal: {expr!r}")
    pos = 0
    dt = base
    while pos < len(rest):
        m = _OP_RE.match(rest, pos)
        if m is None:
            raise ValueError(f"bad date math at {rest[pos:]!r} in {expr!r}")
        op = m.group(1)
        pos = m.end()
        if op.startswith("/"):
            unit = _UNIT_ALIASES.get(op[1:].upper())
            if unit is None:
                raise ValueError(f"unknown unit in {op!r}")
            dt = _round_down(dt, unit)
        else:
            sign = 1 if op[0] == "+" else -1
            m2 = re.match(r"[+-](\d+)([A-Za-z]+)$", op)
            unit = _UNIT_ALIASES.get(m2.group(2).upper())
            if unit is None:
                raise ValueError(f"unknown unit in {op!r}")
            dt = _add(dt, unit, sign * int(m2.group(1)))
    return dt


def date_range_facets(
    df: DataFrame,
    ts_col: str,
    start: str,
    end: str,
    gap_days: int,
    now: datetime,
) -> DataFrame:
    """facet.range over a timestamp column with date-math bounds: rows in
    [start, end) bucketed into gap_days-wide ranges; returns
    (bucket_start timestamp, n) sorted by bucket.  One filter + one
    groupBy on the bucket ordinal — JVM-side, facet counts never iterate
    per bucket."""
    lo = parse_date_math(start, now)
    hi = parse_date_math(end, now)
    gap_s = gap_days * 86400
    # Naive-datetime epoch computed against the naive 1970 origin, NOT
    # .timestamp() (which interprets naive datetimes in the host's local
    # timezone).  The session factory pins spark.sql.session.timeZone=UTC,
    # so this epoch and Spark's unix_timestamp agree on any host.
    lo_epoch = int((lo - datetime(1970, 1, 1)).total_seconds())
    bucket = F.floor(
        (F.unix_timestamp(F.col(ts_col)) - F.lit(lo_epoch)) / F.lit(gap_s)
    )
    return (
        df.where(
            (F.col(ts_col) >= F.lit(lo)) & (F.col(ts_col) < F.lit(hi))
        )
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.timestamp_seconds(
                F.col("bucket") * gap_s + F.lit(lo_epoch)
            ).alias("bucket_start"),
            "n",
        )
        .orderBy("bucket_start")
    )
