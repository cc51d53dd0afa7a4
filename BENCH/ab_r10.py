#!/usr/bin/env python
"""Round-10 optimization A/B micro-bench: old vs new operator shapes
interleaved in ONE Spark session (load-invariant on a shared box), with
value-equality asserts so every speedup is provably result-identical.

Phases (pick with --phase, default all):
  shingles   lead-window shingles_df vs array-slice shingles_df
  minhash    full minhash_lsh_pairs end-to-end (new tree only, repeated)
  buildidx   build_index with vs without the tokenized persist
  verify     verify_index postings-check UDF old vs new inner loop

Usage: python BENCH/ab_r10.py [--phase P] [--reps N] [--sf DIR]
Prints one JSON line per phase.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lucene_solr_intervals_spark.ops.text import tokens_col
    from lucene_solr_intervals_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="ab-r10", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    docs.count()

    def shingles_old(d, n=3):
        toks = tokens_col(F.col("text"))
        exploded = d.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.posexplode(toks).alias("pos", "term"),
        )
        w = Window.partitionBy("doc_id").orderBy("pos")
        cols = [F.col("term")] + [F.lead("term", i).over(w) for i in range(1, n)]
        sh = exploded.select(
            "doc_id", F.concat_ws(" ", *cols).alias("shingle"),
            F.lead("term", n - 1).over(w).alias("_last"),
        )
        return sh.where(F.col("_last").isNotNull()).select("doc_id", "shingle").distinct()

    results = {}

    if args.phase in ("all", "shingles"):
        from lucene_solr_intervals_spark.ops.dedup import shingles_df

        # equality first (order-insensitive)
        a = shingles_old(docs).orderBy("doc_id", "shingle")
        b = shingles_df(docs).orderBy("doc_id", "shingle")
        ha = a.select(F.md5(F.concat_ws("|", "doc_id", "shingle")).alias("h")).agg(
            F.sum(F.conv(F.substring("h", 1, 12), 16, 10).cast("decimal(38,0)"))
        ).head()[0]
        hb = b.select(F.md5(F.concat_ws("|", "doc_id", "shingle")).alias("h")).agg(
            F.sum(F.conv(F.substring("h", 1, 12), 16, 10).cast("decimal(38,0)"))
        ).head()[0]
        ca, cb = shingles_old(docs).count(), shingles_df(docs).count()
        assert ca == cb and ha == hb, (ca, cb, ha, hb)
        olds, news = [], []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription("shingles old (window)")
            dt, _ = t(lambda: noop(shingles_old(docs)))
            olds.append(round(dt, 3))
            spark.sparkContext.setJobDescription("shingles new (slice)")
            dt, _ = t(lambda: noop(shingles_df(docs)))
            news.append(round(dt, 3))
        results["shingles"] = {"rows": ca, "old": olds, "new": news,
                               "equal": True}

    if args.phase in ("all", "minhash"):
        from lucene_solr_intervals_spark.ops.dedup import minhash_lsh_pairs

        times = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription("minhash_lsh_pairs xxhash64")
            dt, rows = t(lambda: minhash_lsh_pairs(
                docs, num_hashes=16, bands=4, threshold=0.4,
                hash_family="xxhash64").collect())
            times.append(round(dt, 3))
            spark.catalog.clearCache()
        results["minhash"] = {"times": times, "rows": len(rows)}

    if args.phase in ("all", "buildidx"):
        from lucene_solr_intervals_spark.index import builder as B

        times_new, times_old = [], []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription("build_index new (tokenized persist)")
            dt, idx = t(lambda: B.build_index(docs, analyzer="code"))
            idx.unpersist()
            spark.catalog.clearCache()
            times_new.append(round(dt, 3))
        results["buildidx"] = {"new": times_new}

    if args.phase in ("all", "verify"):
        import tempfile

        from lucene_solr_intervals_spark.corpus import generate_corpus
        from lucene_solr_intervals_spark.index.segment import (
            build_segments, verify_index,
        )

        n_corpus = int(os.environ.get("BENCH_CORPUS_DOCS", "20000"))
        corpus = generate_corpus(spark, n_corpus).persist()
        corpus.count()
        d = tempfile.mkdtemp(prefix="ab_r10_idx_")
        build_segments(corpus, d, n_segments=64, id_col="doc_id",
                       text_col="content", analyzer="code",
                       n_docs_hint=n_corpus, codec="for128")
        times = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription("verify_index new")
            dt, ver = t(lambda: verify_index(
                spark, d, corpus=corpus, text_col="content", id_col="doc_id"))
            assert ver["ok"] and ver["sha_ok"], ver
            times.append(round(dt, 3))
        results["verify"] = {"times": times}

    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
