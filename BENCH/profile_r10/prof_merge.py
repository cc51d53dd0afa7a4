import os, sys, time, json, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus
from lucene_solr_intervals_spark.index.segment import (
    build_segments, read_manifest, merge_segments, load_postings, load_docs)
spark = get_spark(app_name="prof-merge", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, 20000).persist(); corpus.count()
d = tempfile.mkdtemp(prefix="prof_merge_idx_")
build_segments(corpus, d, n_segments=64, id_col="doc_id", text_col="content",
               analyzer="code", n_docs_hint=20000, codec="for128")
out = {}
live = [s["seg"] for s in read_manifest(d)["segments"] if s["status"] == "done"]
tier = live[: max(2, len(live)//4)]
# timed sub-steps replicated
t0=time.time()
p = load_postings(spark, d).where(F.col("seg").isin(tier))
p.count(); out["postings_scan_count"] = round(time.time()-t0,3)
t0=time.time()
dn = load_docs(spark, d).where(F.col("seg").isin(tier)); dn.count()
out["docs_mergeschema_scan"] = round(time.time()-t0,3)
t0=time.time()
m = merge_segments(spark, d, tier, new_seg=max(live)+1)
out["merge_total"] = round(time.time()-t0,3)
# second merge on another tier for warm numbers
tier2 = live[len(live)//4: len(live)//2]
t0=time.time()
merge_segments(spark, d, tier2, new_seg=max(live)+2)
out["merge_total_warm"] = round(time.time()-t0,3)
print(json.dumps(out))
spark.stop()
