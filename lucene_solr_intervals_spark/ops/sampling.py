"""Deterministic sampling / split assignment for training-data pipelines.

A 100 TB corpus is never split with an RNG: assignments must be STABLE
under re-runs, re-partitioning, executor failure, and incremental appends.
The standard tool is a content-free id hash mapped to [0, 1) — every row's
fate is a pure function of (id, salt), so the same doc lands in the same
split forever and downstream joins never see a moving boundary.

Both operators are single whole-stage-codegen expressions (hash48 — the
same md5-derived 48-bit family as the MinHash pipeline, so the DuckDB
oracle computes IDENTICAL assignments); thresholds compare as INTEGERS
against rate * 2^48 (no float division, engine-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import hash48

HASH_SPACE = 1 << 48


def _bucket_col(id_col: str, salt: str):
    """48-bit uniform bucket of (id, salt) — hash48 of 'id@salt'."""
    return hash48(F.concat(F.col(id_col).cast("string"), F.lit("@" + salt)), 0)


def bucket_sql(id_expr: str, salt: str) -> str:
    """DuckDB twin of _bucket_col (same bits)."""
    from .dedup import hash48_sql

    return hash48_sql(f"CAST({id_expr} AS VARCHAR) || '@{salt}'", 0)


def hash_split(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Assign every row to a named split by cumulative hash thresholds:
    (doc_id, split).  weights need not sum to 1; the remainder falls into
    the LAST split (thresholds are cumulative integer boundaries)."""
    names = list(weights)
    if not names:
        raise ValueError("hash_split needs at least one named split")
    bounds = []
    acc = 0.0
    for n in names[:-1]:
        acc += float(weights[n])
        bounds.append(int(acc * HASH_SPACE))
    expr = None
    for n, t in zip(names[:-1], bounds):
        cond = F.col("_b") < t
        expr = F.when(cond, F.lit(n)) if expr is None else expr.when(cond, F.lit(n))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"), _bucket_col(id_col, salt).alias("_b"))
        .select("doc_id", expr.alias("split"))
    )


def hash_split_sql(weights: dict[str, float], id_expr: str = "doc_id", salt: str = "split") -> str:
    """CASE expression mirroring hash_split (for oracle SQL)."""
    names = list(weights)
    acc = 0.0
    arms = []
    for n in names[:-1]:
        acc += float(weights[n])
        arms.append(f"WHEN {bucket_sql(id_expr, salt)} < {int(acc * HASH_SPACE)} THEN '{n}'")
    return "CASE " + " ".join(arms) + f" ELSE '{names[-1]}' END"


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic downsampling (training-data MIXING: keep
    x% of each source).  Keeps a row iff bucket(id, salt) < rate(stratum)
    * 2^48.  The rate table is tiny — it compiles into the expression
    (broadcast-free); rows of unlisted strata keep `default_rate`.
    Returns the surviving rows (all columns)."""
    b = _bucket_col(id_col, salt)
    thr = None
    for s, r in rates.items():
        cond = F.col(strata_col) == s
        t = F.lit(int(float(r) * HASH_SPACE))
        thr = F.when(cond, t) if thr is None else thr.when(cond, t)
    thr = (
        F.lit(int(default_rate * HASH_SPACE))
        if thr is None
        else thr.otherwise(F.lit(int(default_rate * HASH_SPACE)))
    )
    return docs.where(b < thr)
