"""Driver contract for the spark-graft builder (PySpark target).

Engine: lucene_solr_intervals_spark — a PySpark-native inverted-index +
BM25 + minimal-interval query engine (see SURVEY.md).  The driver's verify
runs ``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build the inverted index
    over `documents`, run a BM25 boolean top-10 through the engine."""
    from lucene_solr_intervals_spark import driver_queries as DQ
    from lucene_solr_intervals_spark.search import queries as Q

    sf_dir = "/root/testdata/sf0.001"
    s = DQ.searcher(spark, sf_dir, mode="sql")
    q = Q.Boolean(should=(Q.Term("vector"), Q.Term("window")), must=(Q.Term("merge"),))
    return DQ._topk(s.scored(q), k=10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from lucene_solr_intervals_spark import driver_queries as DQ

    return dict(DQ.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column names/types).
    EVERY queries() entry has one — including MinHash/SimHash/ANN, whose
    md5-derived 48-bit hash family (ops.dedup.hash48) was chosen so DuckDB
    reproduces the identical bits; ANN hyperplanes are deterministic
    literals embedded in the SQL."""
    from lucene_solr_intervals_spark import driver_queries as DQ

    return dict(DQ.ORACLES)
