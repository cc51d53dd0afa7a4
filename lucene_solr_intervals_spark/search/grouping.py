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


def block_join_grouped_hits(
    child_hits: DataFrame,
    parent_col: str,
    k_parents: int = 10,
    k_children: int = 3,
    score_mode: str = "max",
    child_id: str = "doc_id",
) -> DataFrame:
    """ToParentBlockJoinCollector analog (join/ToParentBlockJoinCollector.java:78
    getTopGroups): the top `k_parents` parents ranked by their aggregated
    child score, each carrying its matching children ranked within.

    `child_hits` must carry (child_id, score, parent_col).  score_mode maps
    ScoreMode.{Max,Total,Avg} (ToParentBlockJoinQuery.java ScoreMode).

    Plan: both windows (child rank within parent, parent aggregate) share
    the parent_col partition — ONE shuffle; the parent top-k reduces to the
    per-parent aggregate rows (one per parent) sorted/limited, broadcast
    back as a semi-join.  No per-parent job, no driver materialization.
    """
    agg = {"max": F.max, "total": F.sum, "avg": F.avg}[score_mode]
    wp = Window.partitionBy(parent_col)
    ranked = (
        child_hits.withColumn(
            "child_rank",
            F.row_number().over(
                wp.orderBy(F.desc("score"), F.asc(child_id))
            ),
        )
        .withColumn("parent_score", agg("score").over(wp))
        .where(F.col("child_rank") <= k_children)
    )
    top_parents = (
        ranked.where(F.col("child_rank") == 1)
        .select(parent_col, "parent_score")
        .orderBy(F.desc("parent_score"), F.asc(parent_col))
        .limit(k_parents)
        .withColumn(
            "parent_rank",
            F.row_number().over(
                Window.orderBy(F.desc("parent_score"), F.asc(parent_col))
            ),
        )
        .select(parent_col, "parent_rank")
    )
    return ranked.join(F.broadcast(top_parents), parent_col).select(
        parent_col,
        "parent_rank",
        F.col("parent_score"),
        F.col(child_id),
        "child_rank",
        "score",
    )


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
