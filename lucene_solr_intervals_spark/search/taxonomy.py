"""Taxonomy facets: hierarchical dim/path counting, drill-down, sideways.

Spark analog of the reference's lucene/facet taxonomy side:

  FacetsConfig + FacetField (facet/FacetField.java:29, FacetsConfig.java)
      -> ``FacetsConfig`` here maps each dimension to an ORDERED list of
      corpus columns forming its path components (dim/c1/c2/...).  The
      taxonomy "ordinal tree" is implicit: a path prefix IS its ordinal.
  FacetsCollector (facet/FacetsCollector.java:51)
      -> the hit-set DataFrame (doc_id) produced by Searcher.matching().
  FastTaxonomyFacetCounts.getTopChildren
      (taxonomy/FastTaxonomyFacetCounts.java:34, TaxonomyFacets.java:93)
      -> top_children(): prefix filter + ONE groupBy on the child column.
  DrillDownQuery (facet/DrillDownQuery.java:50; :89-92 — base query MUST
      plus one MUST clause per constrained dimension)
      -> drill_down(): hit set semi-joined to the per-dim filtered docs.
  DrillSideways.search (facet/DrillSideways.java:63,137 — for each
      drilled dim, facet counts are gathered against the base query plus
      the drill-downs of every OTHER dim)
      -> drill_sideways(): a union of per-dim top_children frames, each
      with the other dims' constraints applied.

Scale shape: dimensions are plain columns of the docs table, so every
operation below is a column filter + semi join + groupBy — predicate
pushdown reaches the parquet scan, the hit set is the only small side
(broadcast by AQE), and counting any level of the hierarchy is a single
shuffle on the child column.  No path explosion is materialized unless
``facet_table`` is asked for explicitly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class FacetsConfig:
    """dim name -> ordered corpus columns forming the dim's path.

    Example: {"origin": ["source", "lang"]} declares paths like
    origin/src7/en — the FacetField(dim, path...) role."""

    dims: dict[str, list[str]] = field(default_factory=dict)

    def cols(self, dim: str) -> list[str]:
        return self.dims[dim]


def facet_table(docs: DataFrame, config: FacetsConfig) -> DataFrame:
    """Exploded taxonomy relation: (doc_id, dim, path, depth) with one row
    per path PREFIX per doc — the materialized ordinal table (the
    taxonomy index file role).  Only needed for bulk exports; the query
    operators below work straight off the docs columns."""
    parts = []
    for dim, cols in sorted(config.dims.items()):
        arr = F.array(*[F.col(c).cast("string") for c in cols])
        d = (
            docs.select(F.col("doc_id").cast("long").alias("doc_id"), arr.alias("pp"))
            .select(
                "doc_id",
                F.lit(dim).alias("dim"),
                F.posexplode(
                    F.expr(
                        f"transform(sequence(1, {len(cols)}),"
                        " i -> array_join(slice(pp, 1, i), '/'))"
                    )
                ).alias("d0", "path"),
            )
            .select("doc_id", "dim", "path", (F.col("d0") + 1).alias("depth"))
        )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _dim_filter(docs: DataFrame, config: FacetsConfig, dim: str, path: tuple) -> DataFrame:
    """Docs matching one dimension constraint (a DrillDownQuery clause —
    DrillDownQuery.java:92 one MUST term per path)."""
    cols = config.cols(dim)
    if len(path) > len(cols):
        raise ValueError(f"path {path} deeper than dim {dim} ({cols})")
    out = docs
    for c, v in zip(cols, path):
        out = out.where(F.col(c).cast("string") == str(v))
    return out


def drill_down(
    hits: DataFrame,
    docs: DataFrame,
    config: FacetsConfig,
    constraints: dict[str, tuple],
) -> DataFrame:
    """DrillDownQuery (DrillDownQuery.java:89-92): base-query hit set AND
    one constraint per dimension.  Returns the narrowed hit set (doc_id).
    Constraints compose as a single filtered-docs semi join (one scan of
    the docs table regardless of how many dims are drilled)."""
    filtered = docs
    for dim, path in sorted(constraints.items()):
        filtered = _dim_filter(filtered, config, dim, path)
    return hits.join(
        filtered.select(F.col("doc_id").cast("long").alias("doc_id")),
        "doc_id",
        "semi",
    )


def top_children(
    hits: DataFrame,
    docs: DataFrame,
    config: FacetsConfig,
    dim: str,
    path: tuple = (),
    top_n: int | None = None,
) -> DataFrame:
    """getTopChildren(topN, dim, path...) (TaxonomyFacets.java:93): counts
    of the NEXT path component under `path`, over the hit set.  Returns
    (child, n) ordered count desc, label asc (FacetResult ordering)."""
    cols = config.cols(dim)
    if len(path) >= len(cols):
        raise ValueError(f"path {path} has no children in dim {dim} ({cols})")
    narrowed = _dim_filter(docs, config, dim, path)
    child = cols[len(path)]
    out = (
        hits.select(F.col("doc_id").cast("long").alias("doc_id"))
        .join(
            narrowed.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col(child).cast("string").alias("child"),
            ),
            "doc_id",
        )
        .groupBy("child")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("child"))
    )
    return out.limit(top_n) if top_n is not None else out


def sum_associations(
    hits: DataFrame,
    docs: DataFrame,
    config: FacetsConfig,
    dim: str,
    value_col: str,
    path: tuple = (),
) -> DataFrame:
    """Association facets (facet/IntAssociationFacetField.java,
    taxonomy/TaxonomyFacetSumIntAssociations): instead of counting docs
    per category, SUM a per-doc association value — same single groupBy
    shape as counting.  Returns (child, total) ordered total desc,
    label asc."""
    cols = config.cols(dim)
    if len(path) >= len(cols):
        raise ValueError(f"path {path} has no children in dim {dim} ({cols})")
    narrowed = _dim_filter(docs, config, dim, path)
    child = cols[len(path)]
    return (
        hits.select(F.col("doc_id").cast("long").alias("doc_id"))
        .join(
            narrowed.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                F.col(child).cast("string").alias("child"),
                F.col(value_col).cast("long").alias("_v"),
            ),
            "doc_id",
        )
        .groupBy("child")
        .agg(F.sum("_v").alias("total"))
        .orderBy(F.desc("total"), F.asc("child"))
    )


def sampled_top_children(
    hits: DataFrame,
    docs: DataFrame,
    config: FacetsConfig,
    dim: str,
    path: tuple = (),
    fraction: float = 0.1,
    seed: int = 42,
) -> DataFrame:
    """RandomSamplingFacetsCollector (facet/RandomSamplingFacetsCollector
    .java:47): facet over a deterministic SAMPLE of the hit set and scale
    the counts back up by 1/fraction (amortized counts, :195) — at 100 TB
    a 1% sample gives the same top-children ordering for a tiny fraction
    of the join/agg work.  Returns (child, n_est)."""
    sampled = hits.sample(withReplacement=False, fraction=fraction, seed=seed)
    out = top_children(sampled, docs, config, dim, path)
    return out.select(
        "child",
        F.round(F.col("n") / F.lit(fraction)).cast("long").alias("n_est"),
    )


def drill_sideways(
    hits: DataFrame,
    docs: DataFrame,
    config: FacetsConfig,
    constraints: dict[str, tuple],
) -> DataFrame:
    """DrillSideways.search (DrillSideways.java:63,137): for every drilled
    dimension, sibling counts are computed against the base query plus the
    drill-downs of every OTHER dimension (so the UI can offer alternative
    values for the dim the user already picked).  Returns one frame
    (dim, child, n) — a union of per-dim top_children, each a small
    aggregate; Spark runs them as one job."""
    parts = []
    for dim in sorted(constraints):
        others = {d: p for d, p in constraints.items() if d != dim}
        near_hits = drill_down(hits, docs, config, others) if others else hits
        parent = tuple(constraints[dim][:-1])
        parts.append(
            top_children(near_hits, docs, config, dim, parent).select(
                F.lit(dim).alias("dim"), "child", "n"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("dim", F.desc("n"), F.asc("child"))
