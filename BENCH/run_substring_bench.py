#!/usr/bin/env python
"""Exact-substring dedup throughput at two parallelism levels.

Generates a zipf corpus once (hot words -> organic cross-doc duplicated
8-grams), then times duplicate_span_stats end-to-end (fingerprint groupBy +
semi-join + islands window + count collapse) in a FRESH subprocess per
level, interleaved best-of-N — the same protocol as BENCH/run_scaling.py.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.ops.dedup import duplicate_span_stats
spark = get_spark(app_name="subbench", master="local[{cpus}]",
                  shuffle_partitions={parts})
docs = spark.read.parquet({corpus!r})
t0 = time.time()
out = duplicate_span_stats(docs, text_col="content", L=8, min_doc_freq=2)
agg = out.selectExpr("count(*) n", "sum(dup_tokens) dt",
                     "sum(cast(dup_spans > 0 as long)) nd").head()
wall = time.time() - t0
print(json.dumps({{"wall": round(wall, 3), "docs": agg["n"],
                   "dup_tokens": int(agg["dt"]), "docs_with_dups": int(agg["nd"]),
                   "docs_per_sec": round(agg["n"] / wall, 1)}}))
"""


def run(cpus: int, corpus: str) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, parts=2 * cpus, corpus=corpus)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=900)
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(r.stderr[-500:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100000)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "substring_bench_r9.json"))
    args = ap.parse_args()

    corpus = f"/tmp/lsi_subbench_{args.docs}.parquet"
    if not os.path.exists(corpus):
        from lucene_solr_intervals_spark.corpus import generate_corpus
        from lucene_solr_intervals_spark.session import get_spark

        spark = get_spark(app_name="mk", master="local[8]", shuffle_partitions=16)
        generate_corpus(spark, args.docs, distribution="zipf").write.mode(
            "overwrite").parquet(corpus)
        spark.stop()

    runs: dict[int, list[dict]] = {args.low: [], args.high: []}
    for i in range(args.repeats):
        for cpus in (args.low, args.high):
            res = run(cpus, corpus)
            print(f"[subbench] local[{cpus}] run {i + 1}: {json.dumps(res)}", flush=True)
            runs[cpus].append(res)
    best = {c: max(r["docs_per_sec"] for r in runs[c]) for c in runs}
    factor = args.high / args.low
    out = {
        "corpus_docs": args.docs,
        "L": 8,
        "protocol": f"interleaved subprocesses, best-of-{args.repeats} per level",
        "docs_per_sec": {f"local[{c}]": best[c] for c in sorted(best)},
        "scaling_efficiency": round(best[args.high] / best[args.low] / factor, 3),
        "result_invariant": {k: runs[args.low][0][k] for k in
                             ("docs", "dup_tokens", "docs_with_dups")},
        "runs": {f"local[{c}]": runs[c] for c in runs},
    }
    assert all(
        (r["dup_tokens"], r["docs_with_dups"]) ==
        (out["result_invariant"]["dup_tokens"], out["result_invariant"]["docs_with_dups"])
        for rs in runs.values() for r in rs
    ), "results differ across levels/runs"
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
