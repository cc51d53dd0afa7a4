"""Local replica of the driver's correctness harness: run every queries()
entry on Spark at sf0.01 and compare against oracle_sql() via DuckDB —
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as mod

    return mod


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def _queries_to_check(entry_mod):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


def test_entry_smoke(entry_mod, spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]


def test_all_queries_against_duckdb(entry_mod, spark, duck):
    failures = []
    for name, fn, sql in _queries_to_check(entry_mod):
        try:
            sdf = fn(spark, SF_DIR)
            scols = [c.lower() for c in sdf.columns]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append((name, "spark-error", str(e)[:300]))
            continue
        if sql is None:
            # rows-only check: it must run and produce a stable schema
            assert isinstance(srows, list), name
            continue
        try:
            res = duck.execute(sql)
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, "duckdb-error", str(e)[:300]))
            continue
        if sorted(scols) != sorted(dcols):
            failures.append((name, "schema", scols, dcols))
            continue
        if len(srows) != len(drows):
            failures.append((name, "rowcount", len(srows), len(drows)))
            continue
        # map spark rows into duckdb column order
        sidx = {c: i for i, c in enumerate(scols)}
        srows_d = [tuple(r[sidx[c]] for c in dcols) for r in srows]
        a = _normalize(srows_d, dcols)
        b = _normalize(drows, dcols)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:5]
            failures.append((name, "values", diff, f"{len(a)} rows"))
    assert not failures, "\n".join(repr(f) for f in failures)
