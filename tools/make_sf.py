#!/usr/bin/env python
"""Synthesize a larger scale factor from an existing one, deterministically.

sf1 = 10 shifted copies of sf0.1: each copy offsets the table's OWN unique
key column by copy * (max_key + 1), so engine invariants (unique doc ids,
unique vec ids) hold while every row's content is preserved.  Correctness
at the new scale is a PARITY check — Spark and DuckDB read the very same
parquet — so foreign-key relationships across copies are irrelevant to the
compare; keys that queries look up by value (doc_id, vec_id 0, event ids)
keep their original values in copy 0.

Usage: python tools/make_sf.py [--src /root/testdata/sf0.1] \
           [--dst /tmp/testdata/sf1] [--copies 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
# per-table unique key to shift (None: plain duplication — TPC-H dimension
# parity queries never build engine indexes, duplicates compare identically)
SHIFT_KEY = {
    "documents": "doc_id",
    "embeddings": "vec_id",
    "events": "event_id",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/testdata/sf1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = f"{args.src}/{t}.parquet"
        dst = f"{args.dst}/{t}.parquet"
        key = SHIFT_KEY.get(t)
        if key is None:
            sel = f"SELECT * FROM read_parquet('{src}'), range({args.copies})"
        else:
            (mx,) = con.execute(
                f"SELECT max({key}) + 1 FROM read_parquet('{src}')"
            ).fetchone()
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{src}')"
                ).fetchall()
            ]
            proj = ", ".join(
                f"{c} + r.range * {mx} AS {c}" if c == key else c for c in cols
            )
            sel = (
                f"SELECT {proj} FROM read_parquet('{src}'), "
                f"range({args.copies}) r"
            )
        con.execute(f"COPY ({sel}) TO '{dst}' (FORMAT PARQUET)")
        (n,) = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()
        print(f"{t}: {n} rows -> {dst}", flush=True)


if __name__ == "__main__":
    main()
