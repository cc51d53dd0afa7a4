"""CLI entry point for spark-submit runs.

Usage (north rule: `spark-submit --py-files dist/engine.zip`):

  # package the engine
  (cd /root/repo && zip -qr dist/engine.zip lucene_solr_intervals_spark)

  # build a packed index from a corpus parquet (repo/path/.../content shape)
  spark-submit --master local[32] --py-files dist/engine.zip \
      -m lucene_solr_intervals_spark build \
      --input /data/corpus.parquet --index /data/index --segments 64

  # query it
  spark-submit ... -m lucene_solr_intervals_spark query \
      --index /data/index --terms get_index,merge_posting --k 10

Subcommands: build, merge, query, verify.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lucene_solr_intervals_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build packed segments from a corpus table")
    src = b.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="path read as --format (default parquet)")
    src.add_argument(
        "--table",
        help="catalog table name, e.g. an Iceberg table like "
        "catalog.db.source_files with (repo, path, commit, lang, content)",
    )
    b.add_argument("--format", default="parquet")
    b.add_argument("--index", required=True)
    b.add_argument("--segments", type=int, default=64)
    b.add_argument("--text-col", default="content")
    b.add_argument("--id-col", default=None)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--bloom", action="store_true",
                   help="write per-segment term-dictionary bloom sidecars "
                        "(miss terms then schedule zero tasks)")
    b.add_argument("--codec", default="varbyte",
                   help="postings codec name (codecs.registry: varbyte, plain32, for128)")

    m = sub.add_parser("merge", help="compact live segments (tiered)")
    m.add_argument("--index", required=True)
    m.add_argument("--segs-per-tier", type=int, default=10)
    m.add_argument("--workers", type=int, default=1,
                   help="concurrent tier merges (ConcurrentMergeScheduler analog)")

    q = sub.add_parser("query", help="BM25 top-k over the packed index")
    q.add_argument("--index", required=True,
                   help="index dir, or comma-separated shard dirs "
                        "(scatter-gather with distributed IDF)")
    q.add_argument("--terms", required=True, help="comma-separated")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--mode", default="wand", choices=["wand", "exhaustive"])
    q.add_argument("--and", dest="conjunctive", action="store_true")

    v = sub.add_parser("verify", help="CheckIndex invariants")
    v.add_argument("--index", required=True)
    v.add_argument("--corpus", default=None)
    v.add_argument("--text-col", default="content")

    d = sub.add_parser("delete", help="tombstone doc ids (liveDocs; reclaimed at merge)")
    d.add_argument("--index", required=True)
    d.add_argument("--doc-ids", required=True, help="comma-separated global doc ids")

    r = sub.add_parser(
        "repair", help="CheckIndex -fix: drop segments that fail checks (loses their docs)"
    )
    r.add_argument("--index", required=True)
    r.add_argument("--dry-run", action="store_true",
                   help="report what would be dropped without mutating")

    sp = sub.add_parser(
        "split", help="IndexSplitter: shard along segment boundaries (hardlinks)"
    )
    sp.add_argument("--index", required=True)
    sp.add_argument("--out", required=True, help="comma-separated shard dirs")

    args = ap.parse_args(argv)

    if args.cmd == "split":
        # pure metadata + hardlink work — no Spark session needed
        from .index.segment import split_index

        manifests = split_index(args.index, args.out.split(","))
        print(
            json.dumps(
                [
                    {"n_docs": m["n_docs"], "segments": len(m["segments"])}
                    for m in manifests
                ]
            )
        )
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"lsi-{args.cmd}")

    if args.cmd == "build":
        from .index.segment import build_segments

        # Iceberg/catalog tables load via read.table (predicate pushdown,
        # snapshot isolation and partition pruning come from the connector);
        # --input paths via the named source format
        if args.table:
            corpus = spark.read.table(args.table)
        else:
            corpus = spark.read.format(args.format).load(args.input)
        manifest = build_segments(
            corpus,
            args.index,
            n_segments=args.segments,
            id_col=args.id_col,
            text_col=args.text_col,
            resume=args.resume,
            codec=args.codec,
            bloom=args.bloom,
        )
        print(json.dumps(manifest["metrics"]))
    elif args.cmd == "merge":
        from .index.segment import (
            concurrent_merge,
            merge_segments,
            plan_merges,
            read_manifest,
        )

        manifest = read_manifest(args.index)
        plans = plan_merges(manifest, args.segs_per_tier)
        if args.workers > 1:
            concurrent_merge(
                spark, args.index, args.segs_per_tier, max_workers=args.workers
            )
        else:
            new_seg = 1 + max(s["seg"] for s in manifest["segments"])
            for plan in plans:
                merge_segments(spark, args.index, plan, new_seg)
                new_seg += 1
        print(json.dumps({"merged_tiers": len(plans), "workers": args.workers}))
    elif args.cmd == "query":
        dirs = args.index.split(",")
        if len(dirs) > 1:
            from .search.multi import MultiIndexSearcher

            s = MultiIndexSearcher(spark, dirs)
        else:
            from .search.wand import SegmentSearcher

            s = SegmentSearcher(spark, dirs[0])
        rows = s.search(
            args.terms.split(","), k=args.k, mode=args.mode, conjunctive=args.conjunctive
        ).collect()
        for r in rows:
            print(json.dumps({"doc_id": r["doc_id"], "score": float(r["score"])}))
    elif args.cmd == "verify":
        from .index.segment import verify_index

        corpus = spark.read.parquet(args.corpus) if args.corpus else None
        res = verify_index(
            spark, args.index, corpus=corpus, text_col=args.text_col, id_col="doc_id"
        )
        print(json.dumps(res))
        return 0 if res["ok"] else 1
    elif args.cmd == "delete":
        from .streaming.nrt import delete_by_doc_ids

        manifest = delete_by_doc_ids(
            args.index, [int(x) for x in args.doc_ids.split(",")]
        )
        print(json.dumps({"tombstones": len(manifest.get("tombstones", []))}))
    elif args.cmd == "repair":
        from .index.segment import repair_index

        print(json.dumps(repair_index(spark, args.index, dry_run=args.dry_run)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
