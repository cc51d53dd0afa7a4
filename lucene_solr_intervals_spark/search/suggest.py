"""Suggest / autocomplete over the term dictionary and stored fields.

Analogs of the reference suggest module (lucene/suggest):

* prefix suggester — AnalyzingSuggester / WFSTCompletionLookup role
  (lucene/suggest/src/java/org/apache/lucene/search/suggest/analyzing/
  AnalyzingSuggester.java:86): completions of a prefix ordered by weight.
  The FST over sorted inputs maps to the term-sorted dictionary DataFrame
  with a pushdown-able `startswith` range predicate; weight = df (the
  "popularity" a search box wants) or any supplied weight column.
* infix suggester — AnalyzingInfixSuggester.java:109: matches the pattern
  anywhere inside the suggestion (it searches an auxiliary index of
  suggestion texts; here a `contains` filter over the same dictionary —
  both are a scan of the suggestion set, ours pruned by Catalyst).
* document-title suggester — AnalyzingInfixSuggester's stored-payload mode:
  suggest full stored strings (e.g. titles) weighted by a numeric column.

All are single pruned scans + a top-k (TakeOrderedAndProject) — no driver
materialization of the dictionary, which at 10^12-doc scale has billions of
terms and must stay distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def suggest_prefix(
    index, prefix: str, k: int = 10, field: str | None = None
) -> DataFrame:
    """Top-k (suggestion, weight) completions of `prefix`, weight = df,
    ordered weight desc then suggestion asc (SortedInputIterator order)."""
    f = field or getattr(index, "default_field", "text")
    ts = index.term_stats.where(F.col("field") == f)
    return (
        ts.where(F.col("term").startswith(prefix))
        .select(
            F.col("term").alias("suggestion"),
            F.col("df").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(k)
    )


def suggest_infix(
    index, pattern: str, k: int = 10, field: str | None = None
) -> DataFrame:
    """Top-k (suggestion, weight) where `pattern` occurs anywhere in the
    term (AnalyzingInfixSuggester.java:109 lookup semantics)."""
    f = field or getattr(index, "default_field", "text")
    ts = index.term_stats.where(F.col("field") == f)
    return (
        ts.where(F.col("term").contains(pattern))
        .select(
            F.col("term").alias("suggestion"),
            F.col("df").cast("long").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(k)
    )


def suggest_stored(
    df: DataFrame,
    text_col: str,
    weight_col: str,
    query: str,
    k: int = 10,
    infix: bool = True,
) -> DataFrame:
    """Suggest full stored strings (AnalyzingInfixSuggester payload mode):
    case-insensitive prefix/infix match over a stored column, weighted by a
    numeric column — e.g. suggest document titles by view count."""
    pat = query.lower()
    t = F.lower(F.col(text_col))
    cond = t.contains(pat) if infix else t.startswith(pat)
    return (
        df.where(cond)
        .select(
            F.col(text_col).alias("suggestion"),
            F.col(weight_col).cast("double").alias("weight"),
        )
        .orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(k)
    )
