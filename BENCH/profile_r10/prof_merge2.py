import os, sys, time, json, tempfile
sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus
from lucene_solr_intervals_spark.index import segment as S
spark = get_spark(app_name="prof-merge2", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, 20000).persist(); corpus.count()
d = tempfile.mkdtemp(prefix="prof_merge2_idx_")
S.build_segments(corpus, d, n_segments=64, id_col="doc_id", text_col="content",
               analyzer="code", n_docs_hint=20000, codec="for128")
out = {}
manifest = S.read_manifest(d)
live = [s["seg"] for s in manifest["segments"] if s["status"] == "done"]
tier = live[:16]
new_seg = max(live)+1
from lucene_solr_intervals_spark.codecs.registry import get_codec
mc = get_codec("for128")
def _mg(pdf): return S._merge_group(pdf, tombstones=frozenset(), codec=mc)
postings = S.load_postings(spark, d).where(F.col("seg").isin(tier))
n_part = 32
t0=time.time()
merged = (postings.withColumn("new_seg", F.lit(new_seg))
          .repartitionByRange(n_part, "term").groupBy("term").applyInPandas(_mg, S.POSTINGS_SCHEMA))
docs = S.load_docs(spark, d).where(F.col("seg").isin(tier))
docs = docs.withColumn("n_tok", F.coalesce(F.col("n_tok"), F.col("doclen")))
docs_new = docs.withColumn("seg", F.lit(new_seg)).persist()
out["plan_build"] = round(time.time()-t0,3)
t0=time.time()
sidecar = docs_new.groupBy("seg").applyInPandas(S._sidecar_from_docs, S.POSTINGS_SCHEMA)
S._stage_partition(merged.unionByName(sidecar), os.path.join(d, "postings"), new_seg)
out["postings_write"] = round(time.time()-t0,3)
t0=time.time()
S._stage_partition(docs_new, os.path.join(d, "docs"), new_seg)
out["docs_write"] = round(time.time()-t0,3)
t0=time.time()
norms_new = (docs_new.select("seg","doc_id","norm_byte").groupBy("seg")
             .applyInPandas(lambda p: S._norms_blob(p), S.NORMS_SCHEMA))
S._stage_partition(norms_new, os.path.join(d, "norms"), new_seg)
out["norms_write"] = round(time.time()-t0,3)
docs_new.unpersist()
# merged-only noop (no write) for the applyInPandas cost alone
t0=time.time()
merged.write.format("noop").mode("overwrite").save()
out["merged_noop"] = round(time.time()-t0,3)
print(json.dumps(out))
spark.stop()
