#!/usr/bin/env python
"""Removal half of exact-substring dedup: gram-string vs tokenhash
fingerprint family, interleaved fresh-subprocess best-of-N (the
run_substring_bench protocol).  Also value-checks that BOTH families
produce the identical cleaned output on this corpus (sum of kept_tokens +
xor-ish checksum of clean_md5), so the fast family is result-identical
here, not just faster.

Writes BENCH/substring_bench_r10.json.
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
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.ops.dedup import remove_duplicate_spans
spark = get_spark(app_name="subclean", master="local[{cpus}]",
                  shuffle_partitions={parts})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({corpus!r})
t0 = time.time()
out = remove_duplicate_spans(docs, text_col="content", L=8, min_doc_freq=2,
                             fingerprint={fp!r})
agg = out.select(
    F.count(F.lit(1)).alias("n"),
    F.sum("kept_tokens").alias("kept"),
    F.sum(F.conv(F.substring("clean_md5", 1, 12), 16, 10).cast("decimal(38,0)")).alias("ck"),
).head()
wall = time.time() - t0
print(json.dumps({{"wall": round(wall, 3), "docs": agg["n"],
                   "kept_tokens": int(agg["kept"]), "checksum": str(agg["ck"]),
                   "docs_per_sec": round(agg["n"] / wall, 1)}}))
"""


def run(cpus: int, corpus: str, fp: str) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, parts=2 * cpus, corpus=corpus, fp=fp)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=1800)
    for line in reversed(r.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(r.stderr[-800:])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=50000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH", "substring_bench_r10.json"))
    args = ap.parse_args()

    corpus = f"/tmp/lsi_subbench_{args.docs}.parquet"
    if not os.path.exists(corpus):
        from lucene_solr_intervals_spark.corpus import generate_corpus
        from lucene_solr_intervals_spark.session import get_spark

        spark = get_spark(app_name="mk", master="local[8]", shuffle_partitions=16)
        generate_corpus(spark, args.docs, distribution="zipf").write.mode(
            "overwrite").parquet(corpus)
        spark.stop()

    runs: dict[str, list[dict]] = {"gram": [], "tokenhash": []}
    for i in range(args.repeats):
        for fp in ("gram", "tokenhash"):
            res = run(args.cpus, corpus, fp)
            print(f"[subclean] {fp} run {i + 1}: {json.dumps(res)}", flush=True)
            runs[fp].append(res)
    inv = {k: runs["gram"][0][k] for k in ("docs", "kept_tokens", "checksum")}
    assert all(
        (r["docs"], r["kept_tokens"], r["checksum"])
        == (inv["docs"], inv["kept_tokens"], inv["checksum"])
        for rs in runs.values() for r in rs
    ), "cleaned output differs across families/runs"
    best = {fp: min(r["wall"] for r in runs[fp]) for fp in runs}
    out = {
        "op": "remove_duplicate_spans (substring-dedup removal half)",
        "corpus_docs": args.docs,
        "L": 8,
        "cpus": args.cpus,
        "protocol": f"interleaved fresh subprocesses, best-of-{args.repeats} per family",
        "wall_best": best,
        "speedup_tokenhash": round(best["gram"] / best["tokenhash"], 3),
        "result_invariant": inv,
        "runs": runs,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
