import os, sys, time, json, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus, VOCAB
from lucene_solr_intervals_spark.index.segment import build_segments
from lucene_solr_intervals_spark.search.wand import SegmentSearcher

cpus = 32
spark = get_spark(app_name="prof-wand", master=f"local[{cpus}]", shuffle_partitions=cpus*2)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, 20000).persist(); corpus.count()
d = tempfile.mkdtemp(prefix="prof_wand_idx_")
build_segments(corpus, d, n_segments=64, id_col="doc_id", text_col="content",
               analyzer="code", n_docs_hint=20000, codec="for128")
out = {}
t0=time.time(); ss = SegmentSearcher(spark, d); out["open"] = round(time.time()-t0,3)

head_terms = ["get_index", "set_posting", "build_segment", "merge_term", "scan_doc"]
# warm one query (codegen)
ss.search(["warmup_zzz"], k=10).collect()

def t(name, fn, reps=1):
    ts=[]
    for _ in range(reps):
        t0=time.time(); fn(); ts.append(round(time.time()-t0,3))
    out[name]=ts

# the bench shape: 5 sequential single-term queries
t("x5_run1", lambda: [ss.search([x], k=10, mode="wand").collect() for x in head_terms])
t("x5_run2", lambda: [ss.search([x], k=10, mode="wand").collect() for x in head_terms])
# single query, repeated same term (plan cache? no — new plan each time)
t("single_q", lambda: ss.search(["get_index"], k=10).collect(), reps=3)
# stats subquery alone
def stats_only():
    p = ss.postings.where(F.col("term").isin(["get_index"]))
    p.groupBy("term").agg(F.sum("df").alias("df_total")).collect()
t("stats_only", stats_only, reps=3)
# cogroup part alone, with fixed weights (scan_with_weights path: no stats join)
import numpy as np
from lucene_solr_intervals_spark.scoring.bm25 import idf as idf32
w = {"get_index": np.float32(idf32(1000, 20000) * np.float32(2.2))}
t("kernel_only", lambda: ss.scan_with_weights(["get_index"], w, ss.cache, 10).orderBy(F.desc("score"), F.asc("doc_id")).limit(10).collect(), reps=3)
print(json.dumps(out))
spark.stop()
