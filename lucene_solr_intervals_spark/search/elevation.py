"""QueryElevationComponent analog (solr/core/src/java/org/apache/solr/
handler/component/QueryElevationComponent.java:100).

Solr's editorial-override component: a config maps a query string to an
ORDERED list of elevated doc ids (pinned above every organic hit, in
config order — the ElevationComparatorSource priority sort) and an
optional exclusion list (removed from results entirely).  Organic order
among non-elevated docs is untouched.

Spark shape: the elevation map is a per-query handful of ids, so it
becomes a broadcast (doc_id, priority) frame left-joined onto the scored
hits; the final sort key is (elevated first by priority, then score desc,
doc_id asc) — one orderBy/limit on top of the existing scored plan, no
extra shuffle beyond the top-k that was already there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ElevationConfig:
    """elevate.xml role: query text -> (elevated ids in order, excluded)."""

    def __init__(self, rules: dict[str, dict] | None = None):
        # rules: {"query text": {"elevate": [ids...], "exclude": [ids...]}}
        self.rules = rules or {}

    def add(self, query_text: str, elevate=(), exclude=()) -> None:
        self.rules[query_text] = {
            "elevate": list(elevate),
            "exclude": list(exclude),
        }

    def lookup(self, query_text: str) -> tuple[list[int], list[int]]:
        r = self.rules.get(query_text, {})
        return list(r.get("elevate", [])), list(r.get("exclude", []))


def elevate(
    scored: DataFrame,
    elevated_ids: list[int],
    excluded_ids: list[int] = (),
    k: int | None = None,
    force: bool = False,
    corpus: DataFrame | None = None,
) -> DataFrame:
    """Apply elevation to a scored (doc_id, score) frame.

    Elevated docs sort first, in CONFIG order (priority = position in the
    list, QueryElevationComponent.BOOSTED_PRIORITY); excluded docs are
    dropped; everything else keeps organic (score desc, doc_id asc) order.
    With ``force`` (Solr forceElevation): elevated docs that did NOT match
    the query are injected with score 0 (needs `corpus` to source them).
    Returns (doc_id, score, elevated)."""
    spark = scored.sparkSession
    prio = spark.createDataFrame(
        [(int(d), i) for i, d in enumerate(elevated_ids)] or [(None, None)],
        "doc_id long, _prio int",
    ).where(F.col("doc_id").isNotNull())

    out = scored.select(F.col("doc_id").cast("long").alias("doc_id"), "score")
    if force and elevated_ids:
        if corpus is None:
            raise ValueError("force elevation needs the corpus frame")
        missing = (
            corpus.select(F.col("doc_id").cast("long").alias("doc_id"))
            .join(F.broadcast(prio.select("doc_id")), "doc_id", "semi")
            .join(out.select("doc_id"), "doc_id", "left_anti")
            .withColumn("score", F.lit(0.0))
        )
        out = out.unionByName(missing)
    out = out.join(F.broadcast(prio), "doc_id", "left")
    if excluded_ids:
        out = out.where(
            ~F.col("doc_id").isin([int(d) for d in excluded_ids])
        )
    out = out.select(
        "doc_id",
        "score",
        F.col("_prio").isNotNull().alias("elevated"),
        F.coalesce(F.col("_prio"), F.lit(2**31 - 1)).alias("_p"),
    ).orderBy(F.asc("_p"), F.desc("score"), F.asc("doc_id"))
    if k is not None:
        out = out.limit(k)
    return out.select("doc_id", "score", "elevated")
