"""Replay the driver contract: queries() vs oracle_sql() at sf0.01.

Mirrors the driver's compare: row count + schema + order-insensitive
value hash (floats via f"{v:.6g}", columns sorted by name).

REPLAY_SF_DIR overrides the data directory (e.g. a synthesized sf1 from
tools/make_sf.py for the 10x-scale correctness point).
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("REPLAY_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                vals.append(f"{v:.6g}")
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            else:
                vals.append(str(v))
        out.append("\x01".join(vals))
    out.sort()
    return "\x02".join(out)


def main():
    only = set(sys.argv[1:]) or None
    from lucene_solr_intervals_spark.session import get_spark
    spark = get_spark(app_name="replay", master="local[8]", shuffle_partitions=16)
    import __spark_entry__ as mod
    qs, oracles = mod.queries(), mod.oracle_sql()
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        entry = {"rows_match": None, "schema_match": None, "hash_match": None,
                 "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            df = fn(spark, SF_DIR)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
            entry["spark_rows"] = len(rows)
            sql = oracles.get(name)
            if sql is None:
                entry["rows_match"] = len(rows) >= 0
                entry["err"] = "no-oracle (rows-only)"
            else:
                cur = con.execute(sql)
                ocols = [d[0] for d in cur.description]
                orows = cur.fetchall()
                entry["oracle_rows"] = len(orows)
                entry["rows_match"] = len(rows) == len(orows)
                entry["schema_match"] = sorted(cols) == sorted(ocols)
                entry["hash_match"] = (entry["schema_match"]
                                       and canon(rows, cols) == canon(orows, ocols))
                if len(rows) == 0 and len(orows) == 0:
                    entry["err"] = "VACUOUS: 0 rows both sides"
        except Exception as e:  # noqa: BLE001
            entry["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = entry
        ok = entry["hash_match"] or (entry["rows_match"] and entry["err"] and "rows-only" in entry["err"])
        print(f"{'PASS' if ok else 'FAIL'} {name} spark={entry['spark_rows']} "
              f"oracle={entry['oracle_rows']} err={entry['err']}", flush=True)
    with open("/tmp/replay_results.json", "w") as f:
        json.dump(results, f, indent=1)
    n_ok = sum(1 for e in results.values()
               if e["hash_match"] or (e["rows_match"] and e["err"] and "rows-only" in (e["err"] or "")))
    print(f"TOTAL {n_ok}/{len(results)} pass")


if __name__ == "__main__":
    main()
