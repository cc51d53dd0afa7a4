"""DateMathParser transcription + date range facets + CustomScoreQuery.

Reference: solr/core/src/java/org/apache/solr/util/DateMathParser.java:95
(parseMath grammar, calendar month arithmetic),
lucene/queries/.../CustomScoreQuery.java:51,182.
"""

from datetime import datetime

import pytest

from lucene_solr_intervals_spark.ops.datemath import parse_date_math

NOW = datetime(2024, 1, 10, 13, 45, 27, 123000)


@pytest.mark.parametrize(
    "expr,want",
    [
        ("NOW", NOW),
        ("NOW/DAY", datetime(2024, 1, 10)),
        ("NOW/HOUR", datetime(2024, 1, 10, 13)),
        ("NOW/MINUTE", datetime(2024, 1, 10, 13, 45)),
        ("NOW/SECOND", datetime(2024, 1, 10, 13, 45, 27)),
        ("NOW/MILLI", datetime(2024, 1, 10, 13, 45, 27, 123000)),
        ("NOW/MONTH", datetime(2024, 1, 1)),
        ("NOW/YEAR", datetime(2024, 1, 1)),
        ("NOW/DAY-7DAYS", datetime(2024, 1, 3)),
        ("NOW+2HOURS", datetime(2024, 1, 10, 15, 45, 27, 123000)),
        ("NOW-1DAY/DAY", datetime(2024, 1, 9)),
        ("NOW/DAY+6MONTHS+3DAYS", datetime(2024, 7, 13)),
        # chained ops apply left to right
        ("NOW/YEAR+1MONTH/MONTH", datetime(2024, 2, 1)),
        # literal base
        ("2023-06-15T08:30:00Z/DAY", datetime(2023, 6, 15)),
        ("2023-06-15T08:30:00.250Z+500MILLIS", datetime(2023, 6, 15, 8, 30, 0, 750000)),
        # calendar month clamping (Jan 31 + 1 month = Feb 29 in a leap year)
        ("2024-01-31T00:00:00Z+1MONTH", datetime(2024, 2, 29)),
        ("2023-01-31T00:00:00Z+1MONTH", datetime(2023, 2, 28)),
        ("2024-03-31T00:00:00Z-1MONTH", datetime(2024, 2, 29)),
        ("2024-01-31T00:00:00Z+1YEAR", datetime(2025, 1, 31)),
        ("2024-02-29T00:00:00Z+1YEAR", datetime(2025, 2, 28)),
    ],
)
def test_parse_date_math(expr, want):
    assert parse_date_math(expr, NOW) == want


@pytest.mark.parametrize("bad", ["TODAY", "NOW/FORTNIGHT", "NOW+DAYS", "NOW*2"])
def test_parse_date_math_rejects(bad):
    with pytest.raises(ValueError):
        parse_date_math(bad, NOW)


def test_date_range_facets(spark):
    from lucene_solr_intervals_spark.ops.datemath import date_range_facets

    rows = [
        (i, datetime(2024, 1, 1 + (i % 12), 6 + (i % 5)), "t") for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["event_id", "ts", "event_type"])
    out = date_range_facets(df, "ts", "NOW/DAY-7DAYS", "NOW/DAY", 1, NOW).collect()
    want = {}
    for _, ts, _t in rows:
        if datetime(2024, 1, 3) <= ts < datetime(2024, 1, 10):
            d = ts.replace(hour=0)
            want[d] = want.get(d, 0) + 1
    got = {r["bucket_start"]: r["n"] for r in out}
    assert got == want
    # 2-day gap buckets partition the window from its start
    out2 = date_range_facets(df, "ts", "NOW/DAY-7DAYS", "NOW/DAY", 2, NOW).collect()
    assert sum(r["n"] for r in out2) == sum(want.values())
    assert all((r["bucket_start"] - datetime(2024, 1, 3)).days % 2 == 0 for r in out2)


def test_custom_score_query(spark):
    from lucene_solr_intervals_spark.index.builder import build_index
    from lucene_solr_intervals_spark.search import queries as Q
    from lucene_solr_intervals_spark.search.executor import Searcher

    docs = [
        (0, "alpha beta", 3.0),
        (1, "alpha alpha", 0.5),
        (2, "beta gamma", 9.0),
        (3, "alpha gamma", 2.0),
    ]
    corpus = spark.createDataFrame(docs, ["doc_id", "text", "popularity"])
    idx = build_index(corpus, analyzer="ws")
    s = Searcher(idx, corpus=corpus, mode="sql")
    base = {r["doc_id"]: r["score"] for r in s.scored(Q.Term("alpha")).collect()}
    q = Q.CustomScore(Q.Term("alpha"), value_exprs=("popularity",), boost=2.0)
    got = {r["doc_id"]: r["score"] for r in s.scored(q).collect()}
    pop = {d: p for d, _, p in docs}
    assert set(got) == set(base)
    for d in base:
        assert got[d] == pytest.approx(base[d] * pop[d] * 2.0, rel=1e-12)
    # two value sources multiply (default CustomScoreProvider)
    q2 = Q.CustomScore(
        Q.Term("alpha"), value_exprs=("popularity", "1.0 + doc_id"), boost=1.0
    )
    got2 = {r["doc_id"]: r["score"] for r in s.scored(q2).collect()}
    for d in base:
        assert got2[d] == pytest.approx(base[d] * pop[d] * (1.0 + d), rel=1e-12)
    # matching set == subquery's
    m = sorted(r["doc_id"] for r in s.matching(q).collect())
    assert m == [0, 1, 3]
    idx.unpersist()


def test_reference_parse_math_transcription():
    """DateMathParserTest.java:180 testParseMath — every golden in the
    reference's suite, transcribed (UTC, Locale.ROOT): rounding to each
    unit, +-1 of each unit, add/sub cancellation, the complex chains, and
    the 'tricky' month-clamping cases (:252-258)."""
    base = datetime(2001, 7, 4, 12, 8, 56, 235000)

    def d(s):
        fmt = "%Y-%m-%dT%H:%M:%S.%f"
        return datetime.strptime(s, fmt)

    cases = [
        ("", "2001-07-04T12:08:56.235"),
        ("/SECOND", "2001-07-04T12:08:56.000"),
        ("/MINUTE", "2001-07-04T12:08:00.000"),
        ("/HOUR", "2001-07-04T12:00:00.000"),
        ("/DAY", "2001-07-04T00:00:00.000"),
        ("/MONTH", "2001-07-01T00:00:00.000"),
        ("/YEAR", "2001-01-01T00:00:00.000"),
        ("+1MILLISECOND", "2001-07-04T12:08:56.236"),
        ("+1SECOND", "2001-07-04T12:08:57.235"),
        ("+1MINUTE", "2001-07-04T12:09:56.235"),
        ("+1HOUR", "2001-07-04T13:08:56.235"),
        ("+1DAY", "2001-07-05T12:08:56.235"),
        ("+1MONTH", "2001-08-04T12:08:56.235"),
        ("+1YEAR", "2002-07-04T12:08:56.235"),
        ("-1MILLISECOND", "2001-07-04T12:08:56.234"),
        ("-1SECOND", "2001-07-04T12:08:55.235"),
        ("-1MINUTE", "2001-07-04T12:07:56.235"),
        ("-1HOUR", "2001-07-04T11:08:56.235"),
        ("-1DAY", "2001-07-03T12:08:56.235"),
        ("-1MONTH", "2001-06-04T12:08:56.235"),
        ("-1YEAR", "2000-07-04T12:08:56.235"),
        ("+1MILLISECOND-1MILLISECOND", "2001-07-04T12:08:56.235"),
        ("+1YEAR-1YEAR", "2001-07-04T12:08:56.235"),
        ("-1MONTH+1MONTH", "2001-07-04T12:08:56.235"),
        ("+1MILLISECOND-1YEAR", "2000-07-04T12:08:56.236"),
        ("+1SECOND-1YEAR", "2000-07-04T12:08:57.235"),
        ("+1MONTH-1YEAR", "2000-08-04T12:08:56.235"),
        ("-1YEAR+1MILLISECOND", "2000-07-04T12:08:56.236"),
        ("-1YEAR+1MONTH", "2000-08-04T12:08:56.235"),
        ("-1YEAR+1MILLISECOND/MONTH", "2000-07-01T00:00:00.000"),
        ("-1YEAR+1SECOND/DAY", "2000-07-04T00:00:00.000"),
        ("-1YEAR+1HOUR/HOUR", "2000-07-04T13:00:00.000"),
        ("-1YEAR+1DAY/SECOND", "2000-07-05T12:08:56.000"),
        ("-1YEAR+1MONTH/SECOND", "2000-08-04T12:08:56.000"),
    ]
    for expr, want in cases:
        assert parse_date_math("NOW" + expr, base) == d(want), expr

    # "tricky" month clamping (:252-258)
    tricky = datetime(2006, 1, 31, 17, 9, 59, 999000)
    assert parse_date_math("NOW+1MONTH", tricky) == d("2006-02-28T17:09:59.999")
    assert parse_date_math("NOW+25MONTH", tricky) == d("2008-02-29T17:09:59.999")
    assert parse_date_math("NOW/MONTH+35DAYS/MONTH", tricky) == d(
        "2006-02-01T00:00:00.000"
    )
    assert parse_date_math("NOW+3MILLIS/MINUTE", tricky) == d(
        "2006-01-31T17:10:00.000"
    )
