import os, sys, time, json, tempfile
sys.path.insert(0, "/root/repo")
import numpy as np
import pandas as pd
from concurrent.futures import ThreadPoolExecutor
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus, VOCAB
from lucene_solr_intervals_spark.index.segment import build_segments
from lucene_solr_intervals_spark.search import wand as W
from lucene_solr_intervals_spark.search.wand import SegmentSearcher, TOPK_SCHEMA, segment_topk_kernel
from lucene_solr_intervals_spark.scoring.bm25 import idf as idf32

cpus = 32
spark = get_spark(app_name="prof-conc2", master=f"local[{cpus}]", shuffle_partitions=cpus*2)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, 20000).persist(); corpus.count()
d = tempfile.mkdtemp(prefix="prof_conc2_idx_")
build_segments(corpus, d, n_segments=64, id_col="doc_id", text_col="content",
               analyzer="code", n_docs_hint=20000, codec="for128")
ss = SegmentSearcher(spark, d)
norms_pre = ss.norms                       # current init = prepartitioned
norms_plain = W.load_norms(spark, d).where(F.col("seg").isin(ss.live)).persist()
norms_plain.count()

def search_inplan(ss, terms, k=10):
    cache, tombstones, n_docs, codec = ss.cache, ss.tombstones, ss.n_docs, ss.codec
    postings = ss.postings.where(F.col("term").isin(terms))
    stats = postings.groupBy("term").agg(F.sum("df").alias("df_total"))
    postings = postings.join(F.broadcast(stats), "term")
    def _run(pdf, npdf):
        weights = {t: (idf32(int(dd), n_docs) * np.float32(2.2)).astype(np.float32)
                   for t, dd in zip(pdf["term"], pdf["df_total"])}
        for t in terms: weights.setdefault(t, np.float32(0.0))
        return segment_topk_kernel(pdf, npdf, weights, cache, k, "wand", False, tombstones, codec)
    per_seg = postings.groupBy("seg").cogroup(ss.norms.groupBy("seg")).applyInPandas(_run, TOPK_SCHEMA)
    return per_seg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

conc_terms = [VOCAB[i] for i in range(0, 240, 10)]
def conc_new():
    with ThreadPoolExecutor(max_workers=12) as ex:
        list(ex.map(lambda t: ss.search([t], k=10, mode="wand").collect(), conc_terms))
def conc_old():
    with ThreadPoolExecutor(max_workers=12) as ex:
        list(ex.map(lambda t: search_inplan(ss, [t], k=10).collect(), conc_terms))

# warm all plan shapes
for n in (norms_pre, norms_plain):
    ss.norms = n
    ss.search(["warmup_zzz"], k=10).collect(); search_inplan(ss, ["warmup_zzz"]).collect()

res = {}
for i in range(3):
    for name, n, fn in (("new_pre", norms_pre, conc_new), ("new_plain", norms_plain, conc_new),
                        ("old_pre", norms_pre, conc_old), ("old_plain", norms_plain, conc_old)):
        ss.norms = n; ss._df_memo = {}
        t0=time.time(); fn(); res.setdefault(name, []).append(round(time.time()-t0,3))
print(json.dumps(res))
spark.stop()
