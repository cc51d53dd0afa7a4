"""Produce BENCH/quality_r{N}.json: MAP / P@10 / MRR for each similarity
on the planted-relevance corpus (quality.py — QualityBenchmark analog).

Usage: python tools/run_quality.py [round_tag]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lucene_solr_intervals_spark.index.builder import build_index  # noqa: E402
from lucene_solr_intervals_spark.quality import (  # noqa: E402
    quality_corpus,
    run_benchmark,
)
from lucene_solr_intervals_spark.search.executor import Searcher  # noqa: E402
from lucene_solr_intervals_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r5"
    spark = get_spark(
        app_name="quality", master="local[8]", shuffle_partitions=16
    )
    corpus, topics, judge = quality_corpus(
        spark, n_topics=8, n_rel=6, n_spam=6, n_noise=1500
    )
    idx = build_index(corpus, analyzer="code")
    out = {
        "harness": "QualityBenchmark analog (quality.py)",
        "corpus": {
            "n_docs": corpus.count(),
            "n_topics": len(topics),
            "relevance": "planted: 6 relevant (both terms 3x, short) + "
            "6 keyword-stuffed spam (term-a 20x, long) per topic",
        },
        "k": 20,
        "similarities": {},
    }
    for name, kw in (
        ("bm25", dict(mode="sql")),
        ("bm25_lucene_quantized", dict(mode="lucene")),
        ("classic", dict(mode="classic")),
        ("dfr_inl2", dict(mode="sql", similarity="dfr_inl2")),
        ("lm_dirichlet", dict(mode="sql", similarity="lm_dirichlet")),
    ):
        t0 = time.time()
        s = Searcher(idx, corpus=corpus, **kw)
        _, agg = run_benchmark(s, topics, judge, k=20)
        out["similarities"][name] = {
            "map": round(agg["map"], 4),
            "p_at_10": round(agg["p_at"][10], 4),
            "mrr": round(agg["mrr"], 4),
            "recall_at_20": round(agg["recall"], 4),
            "wall_sec": round(time.time() - t0, 2),
        }
        print(name, out["similarities"][name])
    dest = Path(__file__).resolve().parent.parent / "BENCH" / f"quality_{tag}.json"
    dest.write_text(json.dumps(out, indent=2) + "\n")
    print("wrote", dest)


if __name__ == "__main__":
    main()
