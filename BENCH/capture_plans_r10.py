#!/usr/bin/env python
"""Capture .explain("formatted") for every query path round 10 touched.

Usage: python BENCH/capture_plans_r10.py <tree_dir> <suffix> <out_dir>
Writes <out_dir>/<name>_<suffix>.txt.  Run with the r9 tree + "before" and
the current tree + "after"."""

from __future__ import annotations

import contextlib
import io
import os
import sys
import tempfile


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    tree, suffix, out_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    sys.path.insert(0, tree)
    os.chdir(tree)
    os.makedirs(out_dir, exist_ok=True)
    from pyspark.sql import functions as F

    from lucene_solr_intervals_spark.session import get_spark

    spark = get_spark(app_name="plans-r10", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = "/root/testdata/sf0.01"

    def save(name, df):
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(explain_str(df))
        print("captured", name, flush=True)

    # ---- declared queries whose plans round 10 touched (Boolean fast path)
    from lucene_solr_intervals_spark.driver_queries import QUERIES

    for name in (
        "bool_or_topk", "bool_and_topk", "bool_min_should_match",
        "classic_bool_topk", "phrase_topk", "dismax_topk",
    ):
        save(name, QUERIES[name](spark, sf_dir))

    # ---- bench paths (packed index): wand search, verify check, merge
    from lucene_solr_intervals_spark.corpus import generate_corpus
    from lucene_solr_intervals_spark.index.segment import (
        _postings_check_udf, build_segments, load_postings, read_manifest,
    )
    from lucene_solr_intervals_spark.search.wand import SegmentSearcher

    corpus = generate_corpus(spark, 800).persist()
    corpus.count()
    d = tempfile.mkdtemp(prefix="plans_r10_idx_")
    build_segments(corpus, d, n_segments=8, id_col="doc_id",
                   text_col="content", analyzer="code", n_docs_hint=800,
                   codec="for128")
    ss = SegmentSearcher(spark, d)
    save("wand_search_term", ss.search(["get_index"], k=10))

    manifest = read_manifest(d)
    live = [s["seg"] for s in manifest["segments"] if s["status"] == "done"]
    postings = load_postings(spark, d).where(F.col("seg").isin(live))
    check = _postings_check_udf("for128")
    save(
        "verify_postings_check",
        postings.select(
            check("doc_ids", "tfs", "positions", "df", "ttf").alias("err")
        ).where(F.col("err") != "").limit(20),
    )

    # merged-postings plan: reproduce merge_segments' merged relation
    import pandas as pd  # noqa: F401

    from lucene_solr_intervals_spark.index import segment as S
    from lucene_solr_intervals_spark.codecs.registry import get_codec

    tier = live[:4]
    mc = get_codec("for128")
    src = S.load_postings(spark, d).where(F.col("seg").isin(tier)).withColumn(
        "new_seg", F.lit(99)
    )
    if hasattr(S, "_merge_partition_batched"):
        def _fn(batches):
            parts = list(batches)
            if parts:
                yield S._merge_partition_batched(
                    pd.concat(parts, ignore_index=True), codec=mc
                )

        merged = src.repartitionByRange(8, "term").mapInPandas(_fn, S.POSTINGS_SCHEMA)
    else:
        def _mg(pdf):
            return S._merge_group(pdf, tombstones=frozenset(), codec=mc)

        merged = (
            src.repartitionByRange(8, "term")
            .groupBy("term")
            .applyInPandas(_mg, S.POSTINGS_SCHEMA)
        )
    save("merge_postings", merged)
    spark.stop()


if __name__ == "__main__":
    main()
