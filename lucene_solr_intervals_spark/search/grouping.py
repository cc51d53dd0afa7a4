"""Grouping / field collapse / expand over scored hits.

Solr-side analogs re-expressed as single window functions:

* group_topk — grouping / field collapse (GroupingSearch.java:53's two-pass
  grouping collector): top-N docs per group value.
* collapse_expand — CollapsingQParserPlugin + ExpandComponent
  (solr/core/src/java/org/apache/solr/handler/component/ExpandComponent.java:95):
  the main result keeps ONE head doc per group (the collapse); the expand
  section returns the next `n_expand` docs of each collapsed group so the
  UI can "show more from this group".

Both are one shuffle on the group key (the window partition); no driver
materialization, no per-group job — the shape that survives a million
groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _ranked(hits: DataFrame, group_col: str) -> DataFrame:
    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc("doc_id"))
    return hits.withColumn("rn", F.row_number().over(w))


def group_topk(hits: DataFrame, group_col: str, k: int = 2) -> DataFrame:
    """Top-k rows per group (field collapse with k heads)."""
    return _ranked(hits, group_col).where(F.col("rn") <= k).drop("rn")


def collapse_expand(
    hits: DataFrame, group_col: str, n_expand: int = 2
) -> tuple[DataFrame, DataFrame]:
    """(collapsed, expanded): collapsed = the rank-1 head per group;
    expanded = ranks 2..n_expand+1 per group (the ExpandComponent section).
    Input must carry (doc_id, score, <group_col>)."""
    ranked = _ranked(hits, group_col)
    collapsed = ranked.where(F.col("rn") == 1).drop("rn")
    expanded = ranked.where(
        (F.col("rn") >= 2) & (F.col("rn") <= n_expand + 1)
    ).drop("rn")
    return collapsed, expanded
