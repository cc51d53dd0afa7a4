import os, sys, time, json, tempfile
sys.path.insert(0, "/root/repo")
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus
from lucene_solr_intervals_spark.index import segment as S
from lucene_solr_intervals_spark.search import wand as W
import pyarrow.parquet as pq, pyarrow as pa, pyarrow.compute as pc

spark = get_spark(app_name="prof-local", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
idx = "/tmp/prof_local_idx20k"
if not os.path.exists(os.path.join(idx, "manifest.json")):
    corpus = generate_corpus(spark, 20000).persist(); corpus.count()
    S.build_segments(corpus, idx, n_segments=64, id_col="doc_id", text_col="content",
                     analyzer="code", n_docs_hint=20000, codec="for128")
ss = W.SegmentSearcher(spark, idx)
terms = ["get_index", "set_posting", "build_segment", "merge_term", "scan_doc"]
# warm once
for t in terms: ss.search([t], k=10, mode="wand").collect()
out = {}
t0=time.time()
for _ in range(3):
    for t in terms: ss.search([t], k=10, mode="wand").collect()
out["search_per_query_ms"] = round((time.time()-t0)/15*1000,1)

# component timing on the driver path internals
segs = ss.live
sd0 = os.path.join(idx, "postings", f"seg={segs[0]}")
f0 = os.path.join(sd0, sorted(f for f in os.listdir(sd0) if f.endswith(".parquet"))[0])
N = 200
t0=time.time()
for _ in range(N): pf = pq.ParquetFile(f0)
out["pq_open_ms"] = round((time.time()-t0)/N*1000,3)
pf = pq.ParquetFile(f0)
cols = [c for c in W.SCORING_COLS if c != "seg"]
t0=time.time()
for _ in range(N): tab = pf.read_row_groups([0], columns=cols)
out["rg_read_ms"] = round((time.time()-t0)/N*1000,3)
vset = pa.array(["get_index"])
t0=time.time()
for _ in range(N): tb = tab.filter(pc.is_in(tab["term"], value_set=vset))
out["filter_ms"] = round((time.time()-t0)/N*1000,3)
t0=time.time()
for _ in range(N): pdf = tb.to_pandas()
out["to_pandas_ms"] = round((time.time()-t0)/N*1000,3)
t0=time.time()
for _ in range(N): npdf = W._seg_norms_pdf(idx, segs[0], False)
out["seg_norms_ms"] = round((time.time()-t0)/N*1000,3)
t0=time.time()
for _ in range(N): W._scoring_file_meta(f0)
out["file_meta_ms"] = round((time.time()-t0)/N*1000,3)
out["n_segs"] = len(segs)
print(json.dumps(out))
spark.stop()
