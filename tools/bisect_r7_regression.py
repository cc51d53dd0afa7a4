"""Phase-level bisect of the r7-vs-r6 same-window ~4% battery drag
(round-7 verdict: spread across build_documents / verify_sha256 /
wand_term_x5; import-time registry growth measured at ~2ms — not it).

Runs the three drag phases in SUBPROCESSES per tree (own Spark JVM,
local[8]), interleaved A/B/A/B so load waves decorrelate from the tree,
and reports per-phase medians + ratios.

Usage: python tools/bisect_r7_regression.py [treeA treeB [repeats]]
Defaults: /tmp/lsi_tree_59dd864 (r6) vs /tmp/lsi_tree_3ac624f (r7), 3.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

CHILD = r"""
import json, sys, time
sys.path.insert(0, {tree!r})
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus
from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.index.segment import build_segments, verify_index
from lucene_solr_intervals_spark.search.wand import SegmentSearcher

spark = get_spark(app_name="bisect", master="local[8]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
import os
docs = spark.read.parquet(os.environ.get("BISECT_SF_DIR", "/root/testdata/sf0.01") + "/documents.parquet")
docs.count()
phases = {{}}

t0 = time.time(); idx = build_index(docs, analyzer="code")
phases["build_documents"] = time.time() - t0

n_corpus = int(os.environ.get("BISECT_CORPUS", "4000"))
corpus = generate_corpus(spark, n_corpus).persist(); corpus.count()
import tempfile
d = tempfile.mkdtemp(prefix="bisect_idx_")
t0 = time.time()
build_segments(corpus, d, n_segments=16, id_col="doc_id",
               text_col="content", analyzer="code", n_docs_hint=n_corpus)
phases["build_segments"] = time.time() - t0

t0 = time.time()
verify_index(spark, d, corpus=corpus, text_col="content", id_col="doc_id")
phases["verify_sha256"] = time.time() - t0

t0 = time.time(); ss = SegmentSearcher(spark, d)
phases["open_searcher"] = time.time() - t0
terms = ["get_index", "set_posting", "build_segment", "merge_term", "scan_doc"]
for t in terms:  # warm
    ss.search([t], k=10, mode="wand").collect()
t0 = time.time()
for t in terms:
    ss.search([t], k=10, mode="wand").collect()
phases["wand_term_x5"] = time.time() - t0
print("PHASES " + json.dumps(phases))
spark.stop()
"""


def run(tree: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(tree=tree)],
        capture_output=True, text=True, timeout=600,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("PHASES "):
            return json.loads(line[7:])
    raise RuntimeError(out.stderr[-800:])


def main() -> None:
    a = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lsi_tree_59dd864"
    b = sys.argv[2] if len(sys.argv) > 2 else "/tmp/lsi_tree_3ac624f"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    runs = {a: [], b: []}
    for i in range(reps):
        for tree in (a, b):
            r = run(tree)
            runs[tree].append(r)
            print(f"[{i+1}] {tree.rsplit('_',1)[-1]}: "
                  + json.dumps({k: round(v, 3) for k, v in r.items()}),
                  flush=True)
    result = {}
    for phase in runs[a][0]:
        ma = statistics.median(r[phase] for r in runs[a])
        mb = statistics.median(r[phase] for r in runs[b])
        result[phase] = {
            "a_median": round(ma, 3), "b_median": round(mb, 3),
            "b_over_a": round(mb / ma, 3),
        }
    print(json.dumps({"a": a, "b": b, "phases": result}, indent=1))


if __name__ == "__main__":
    main()
