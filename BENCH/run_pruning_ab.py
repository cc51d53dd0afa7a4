#!/usr/bin/env python
"""Block-max pruning A/B on the zipf corpus (the skew it exists for).

The uniform F1 corpus has flat tf/norm distributions: every 128-block's
upper bound ties the k-th score, nothing can be rank-safely skipped, and
forcing the pruned path only adds per-term Python (measured 921->255 q/s
in r6 — which is why prune_df defaults OFF).  This harness builds the
`--distribution zipf` corpus (zipfian df, zipfian tf, topical locality in
doc-id order — corpus._make_row_zipf) where block bounds genuinely
separate, then measures the SAME search_many battery with pruning off vs
on, in fresh interleaved subprocesses:

  1. build the zipf packed index ONCE;
  2. per repeat: one subprocess per mode (exhaustive / pruned), each warms
     up untimed, then times `--inner` batches and reports its best;
  3. assert rank identity between the two modes (k rows per term,
     (term, doc_id, round(score,4)) sets equal);
  4. report best q/s per mode + the pruned/exhaustive speedup.

Done-criterion from the r6 verdict: pruned < exhaustive wall-time at equal
top-k on a dense-term battery, rank-identity pinned, with the flat-corpus
no-harm guard (default prune_df=None) untouched.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.search.wand import SegmentSearcher
from lucene_solr_intervals_spark.corpus import VOCAB

cpus = {cpus}
spark = get_spark(app_name="pruning-ab", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus * 2)
spark.sparkContext.setLogLevel("ERROR")
ss = SegmentSearcher(spark, {index_dir!r})
terms = [VOCAB[i] for i in range({batch})]
prune = {prune!r}
ss.search_many(terms, k=10, prune_df=prune).count()  # warm-up (untimed)
best = None
for _ in range({inner}):
    t0 = time.time()
    ss.search_many(terms, k=10, prune_df=prune).count()
    dt = time.time() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({{"mode": "pruned" if prune is not None else "exhaustive",
                   "sec": best, "qps": {batch} / best}}))
spark.stop()
"""

IDENTITY = r"""
import json, sys
sys.path.insert(0, {repo!r})
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.search.wand import SegmentSearcher
from lucene_solr_intervals_spark.corpus import VOCAB

spark = get_spark(app_name="pruning-id", master="local[{cpus}]",
                  shuffle_partitions={cpus} * 2)
spark.sparkContext.setLogLevel("ERROR")
ss = SegmentSearcher(spark, {index_dir!r})
terms = [VOCAB[i] for i in range({batch})]
key = lambda r: (r["query_term"], int(r["doc_id"]), round(float(r["score"]), 4))
a = sorted(map(key, ss.search_many(terms, k=10).collect()))
b = sorted(map(key, ss.search_many(terms, k=10, prune_df={prune}).collect()))
print(json.dumps({{"identical": a == b, "rows": len(a)}}))
spark.stop()
"""


def run(code: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, check=True, cwd=REPO
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def build_once(index_dir: str, docs: int, segments: int, codec: str) -> None:
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus
from lucene_solr_intervals_spark.index.segment import build_segments
spark = get_spark(app_name="pruning-ab-build", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, {docs}, distribution="zipf")
build_segments(corpus, {index_dir!r}, n_segments={segments}, id_col="doc_id",
               text_col="content", analyzer="code", n_docs_hint={docs},
               codec={codec!r})
spark.stop()
"""
    subprocess.run([sys.executable, "-c", code], check=True, cwd=REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--segments", type=int, default=64)
    ap.add_argument("--batch", type=int, default=2000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--inner", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--prune-df", type=int, default=2048)
    ap.add_argument("--index-dir", default="/tmp/lsi_pruning_ab_idx")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--codec", default="for128")
    ap.add_argument("--tag", default="r7")
    args = ap.parse_args()

    if not args.skip_build:
        print(f"[pruning-ab] building {args.docs} zipf docs once ...", flush=True)
        build_once(args.index_dir, args.docs, args.segments, args.codec)

    print("[pruning-ab] rank-identity check ...", flush=True)
    ident = run(IDENTITY.format(repo=REPO, cpus=args.cpus, index_dir=args.index_dir,
                                batch=min(args.batch, 256), prune=args.prune_df))
    print(f"[pruning-ab] identity: {json.dumps(ident)}", flush=True)
    assert ident["identical"], "pruned path diverged from exhaustive ranking"

    runs: dict[str, list[dict]] = {"exhaustive": [], "pruned": []}
    for i in range(args.repeats):
        for prune in (None, args.prune_df):
            r = run(CHILD.format(repo=REPO, cpus=args.cpus, index_dir=args.index_dir,
                                 batch=args.batch, inner=args.inner, prune=prune))
            runs[r["mode"]].append(r)
            print(f"[pruning-ab] repeat {i+1} {r['mode']}: {json.dumps(r)}", flush=True)

    ex = max(r["qps"] for r in runs["exhaustive"])
    pr = max(r["qps"] for r in runs["pruned"])
    result = {
        "corpus_docs": args.docs,
        "distribution": "zipf",
        "codec": args.codec,
        "batch": args.batch,
        "cpus": args.cpus,
        "prune_df": args.prune_df,
        "rank_identity": ident,
        "qps_exhaustive_best": round(ex, 1),
        "qps_pruned_best": round(pr, 1),
        "pruned_speedup": round(pr / ex, 3),
        "all_runs": runs,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH", f"pruning_ab_{args.tag}.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
