import os, sys, time, json, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus
from lucene_solr_intervals_spark.index import segment as S

spark = get_spark(app_name="prof-tail", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, 20000).persist(); corpus.count()
out = {}
# warm one full build first
d = tempfile.mkdtemp(prefix="pt_warm_")
S.build_segments(corpus, d, n_segments=64, id_col="doc_id", text_col="content",
                 analyzer="code", n_docs_hint=20000, codec="for128")
for i in range(2):
    d = tempfile.mkdtemp(prefix="pt_idx_")
    t0=time.time()
    m = S.build_segments(corpus, d, n_segments=64, id_col="doc_id", text_col="content",
                     analyzer="code", n_docs_hint=20000, codec="for128")
    out[f"total_{i}"] = round(time.time()-t0,3)
# instrument the driver tail steps on the last index
t0=time.time()
side_pdf = (spark.read.parquet(os.path.join(d, "postings"))
    .where(F.col("term") == S.DOCS_MARKER)
    .select("seg","df","ttf","doc_ids","tfs","positions","block_last","block_max_tf")
    .toPandas().sort_values("seg").reset_index(drop=True))
out["sidecar_toPandas"] = round(time.time()-t0,3)
t0=time.time()
docs_pdf = S._docs_from_sidecar(side_pdf)
out["docs_expand"] = round(time.time()-t0,3)
t0=time.time()
norms_pdf = S._norms_from_sidecar(side_pdf)
out["norms_expand"] = round(time.time()-t0,3)
t0=time.time()
S._write_seg_partitioned(docs_pdf, "/tmp/pt_docs_out", "docs")
out["docs_pa_write"] = round(time.time()-t0,3)
t0=time.time()
S._write_seg_partitioned(norms_pdf, "/tmp/pt_norms_out", "norms")
out["norms_pa_write"] = round(time.time()-t0,3)
print(json.dumps(out))
spark.stop()
