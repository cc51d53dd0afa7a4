"""Concurrent-x24 + batch A/B probe (r10 norms-from-storage change).

Usage: python prof_conc3.py <repo_root>
Builds the bench index shape (20k docs, 64 segs, for128), then times
3 reps of the bench's concurrent-x24 shape and one search_many batch.
Run interleaved against a control tree for a load-invariant comparison.
"""
import os, sys, time, json, tempfile

sys.path.insert(0, sys.argv[1] if len(sys.argv) > 1 else "/root/repo")
from concurrent.futures import ThreadPoolExecutor
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus, VOCAB
from lucene_solr_intervals_spark.index.segment import build_segments
from lucene_solr_intervals_spark.search.wand import SegmentSearcher

cpus = 32
spark = get_spark(app_name="prof-conc3", master=f"local[{cpus}]",
                  shuffle_partitions=cpus * 2)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, 20000).persist(); corpus.count()
d = tempfile.mkdtemp(prefix="prof_conc3_idx_")
build_segments(corpus, d, n_segments=64, id_col="doc_id", text_col="content",
               analyzer="code", n_docs_hint=20000, codec="for128")
ss = SegmentSearcher(spark, d)
ss.search(["warmup_zzz"], k=10).collect()

conc_terms = [VOCAB[i] for i in range(0, 240, 10)]

def conc():
    with ThreadPoolExecutor(max_workers=12) as ex:
        list(ex.map(lambda t: ss.search([t], k=10, mode="wand").collect(),
                    conc_terms))

out = {}
for i in range(3):
    ss._df_memo = {}
    t0 = time.time(); conc(); out.setdefault("conc_x24", []).append(
        round(time.time() - t0, 3))

batch_terms = [VOCAB[i] for i in range(0, 4000)]
ss.search_many(batch_terms, k=10).count()  # warm (codegen), like bench.py
for i in range(2):
    t0 = time.time(); ss.search_many(batch_terms, k=10).count()
    out.setdefault("batch_x4000", []).append(round(time.time() - t0, 3))
print(json.dumps(out))
spark.stop()
