#!/usr/bin/env python
"""Stage-by-stage profile of minhash_lsh_pairs (bench phase minhash_lsh):
where do the seconds go?  noop-isolated per stage, repeated."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from pyspark.sql import functions as F

    from lucene_solr_intervals_spark.ops import dedup as D
    from lucene_solr_intervals_spark.session import get_spark

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="prof-minhash", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    docs.count()

    def t(name, fn, out, reps=2):
        ts = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
        out[name] = ts

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    # full pipeline, as benched
    t("full_pairs_collect", lambda: D.minhash_lsh_pairs(
        docs, num_hashes=16, bands=4, threshold=0.4,
        hash_family="xxhash64").collect(), out)
    spark.catalog.clearCache()

    # stage 1: shingles (persisted in the real op; here isolated)
    t("shingles_noop", lambda: noop(D.shingles_df(docs)), out)

    # stage 2: signatures over a persisted shingle relation
    sh = D.shingles_df(docs).persist()
    sh.count()
    t("signatures_noop", lambda: noop(D.minhash_signatures(
        docs, 16, shingles=sh, hash_family="xxhash64")), out)

    # stage 3: band explode + self-join + distinct (candidates)
    sig = D.minhash_signatures(docs, 16, shingles=sh, hash_family="xxhash64")
    rows = 4
    band_rows = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(bi).alias("band"),
                F.concat_ws(",", *[
                    F.col("sig")[bi * rows + r].cast("string") for r in range(rows)
                ]).alias("bh"),
            ) for bi in range(4)
        ])).alias("b"),
    ).select("doc_id", "b.band", "b.bh")
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cands = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    t("candidates_noop", lambda: noop(cands), out)

    # stage 4: exact jaccard verify over persisted sh + materialized cands
    cands_p = cands.persist()
    n_c = cands_p.count()
    out["n_candidates"] = n_c
    t("verify_noop", lambda: noop(D._exact_jaccard(sh, cands_p, 0.4)), out)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
