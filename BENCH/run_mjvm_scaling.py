#!/usr/bin/env python
"""Multi-JVM scaling points for the two standing weak rows (r9 VERDICT
next-round #5): batch retrieval and exact-substring dedup, measured across
SEPARATE WORKER PROCESSES instead of threads inside one shared JVM heap.

Protocol: identical to BENCH/run_batch_scaling.py / run_substring_bench.py
(build/generate once; fresh subprocess per sample; levels interleaved;
best-of-N), except the child master is `local-cluster[N,1,mem]` — N real
worker JVMs with ONE core each, so the only thing that changes between
levels is the number of PROCESSES.  This separates the shared-heap
allocation/GC wall (the r9 diagnosis for the flat 2→8 substring row) from
true algorithmic scaling: every worker owns its own heap, its own GC, and
its own Python worker pool — the shape a real cluster has.

Usage:
  python BENCH/run_mjvm_scaling.py --phase batch     [--docs 1000000]
  python BENCH/run_mjvm_scaling.py --phase substring [--docs 100000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.search.wand import SegmentSearcher
from lucene_solr_intervals_spark.corpus import VOCAB

n = {workers}
spark = get_spark(app_name="mjvm-batch", master=f"local-cluster[{{n}},1,{mem}]",
                  shuffle_partitions=n * 2,
                  extra_conf={{"spark.executor.memory": "{mem}m"}})
spark.sparkContext.setLogLevel("ERROR")
ss = SegmentSearcher(spark, {index_dir!r})
terms = [VOCAB[i] for i in range({batch})]
ss.search_many(terms, k=10).count()  # warm-up (untimed): codegen + workers
best = None
for _ in range({inner}):
    t0 = time.time()
    ss.search_many(terms, k=10).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"workers": n, "sec": round(best, 3),
                   "qps": round({batch} / best, 1)}}))
spark.stop()
"""

SUBSTRING_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.ops.dedup import duplicate_span_stats

n = {workers}
spark = get_spark(app_name="mjvm-sub", master=f"local-cluster[{{n}},1,{mem}]",
                  shuffle_partitions=n * 2,
                  extra_conf={{"spark.executor.memory": "{mem}m"}})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({corpus!r})
docs.count()  # warm executors + file listing outside the timed region
t0 = time.time()
out = duplicate_span_stats(docs, text_col="content", L=8, min_doc_freq=2,
                           fingerprint={fingerprint!r})
agg = out.selectExpr("count(*) n", "sum(dup_tokens) dt").head()
wall = time.time() - t0
print(json.dumps({{"workers": n, "wall": round(wall, 3), "docs": agg["n"],
                   "dup_tokens": int(agg["dt"]),
                   "docs_per_sec": round(agg["n"] / wall, 1)}}))
spark.stop()
"""


def run_child(code: str) -> dict:
    env = dict(os.environ)
    # executor-spawned Python workers resolve the engine through the env,
    # not the driver's sys.path
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800, cwd=REPO, env=env)
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError((r.stderr or "no JSON")[-800:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["batch", "substring"], required=True)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--docs", type=int, default=None)
    ap.add_argument("--segments", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--inner", type=int, default=3)
    ap.add_argument("--mem", type=int, default=4096)
    ap.add_argument("--fingerprint", default="tokenhash")
    ap.add_argument("--tag", default="r10")
    args = ap.parse_args()

    if args.phase == "batch":
        docs = args.docs or 1_000_000
        index_dir = f"/tmp/lsi_bench_zipf_{docs}_{args.segments}_for128"
        if not os.path.exists(os.path.join(index_dir, "manifest.json")):
            from run_batch_scaling import build_once  # noqa: E402

            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            print(f"[mjvm] building {docs} docs once ...", flush=True)
            build_once(index_dir, docs, args.segments, "for128")

        def child(workers: int) -> dict:
            return run_child(BATCH_CHILD.format(
                repo=REPO, workers=workers, mem=args.mem,
                index_dir=index_dir, batch=args.batch, inner=args.inner))

        key = "qps"
        extras = {"corpus_docs": docs, "batch": args.batch,
                  "index_dir": index_dir}
    else:
        docs = args.docs or 100_000
        corpus = f"/tmp/lsi_subbench_{docs}.parquet"
        if not os.path.exists(corpus):
            from lucene_solr_intervals_spark.corpus import generate_corpus
            from lucene_solr_intervals_spark.session import get_spark

            spark = get_spark(app_name="mk", master="local[8]",
                              shuffle_partitions=16)
            generate_corpus(spark, docs, distribution="zipf").write.mode(
                "overwrite").parquet(corpus)
            spark.stop()

        def child(workers: int) -> dict:
            return run_child(SUBSTRING_CHILD.format(
                repo=REPO, workers=workers, mem=args.mem, corpus=corpus,
                fingerprint=args.fingerprint))

        key = "docs_per_sec"
        extras = {"corpus_docs": docs, "fingerprint": args.fingerprint}

    runs: dict[int, list[dict]] = {args.low: [], args.high: []}
    for i in range(args.repeats):
        for workers in (args.low, args.high):
            r = child(workers)
            runs[workers].append(r)
            print(f"[mjvm] repeat {i+1} local-cluster[{workers},1,"
                  f"{args.mem}]: {json.dumps(r)}", flush=True)

    factor = args.high / args.low
    lo = max(r[key] for r in runs[args.low])
    hi = max(r[key] for r in runs[args.high])
    result = {
        "phase": args.phase,
        "protocol": f"local-cluster[N,1,{args.mem}] fresh subprocess per "
                    "sample, 1 core per worker JVM, levels interleaved, "
                    f"best of {args.repeats}x{args.inner}",
        "levels": [args.low, args.high],
        f"{key}_low_best": lo,
        f"{key}_high_best": hi,
        "efficiency_raw": round((hi / lo) / factor, 3),
        "runs": {str(k): v for k, v in runs.items()},
        **extras,
    }
    out_path = os.path.join(
        REPO, "BENCH", f"mjvm_{args.phase}_scaling_{args.tag}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
