import os, sys, time, json, tempfile
sys.path.insert(0, "/root/repo")
import pandas as pd
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus
from lucene_solr_intervals_spark.index import segment as S
spark = get_spark(app_name="prof-build", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, 20000).persist(); corpus.count()
out = {}
# whole build x2
for i in range(2):
    d = tempfile.mkdtemp(prefix="prof_build_idx_")
    t0=time.time()
    S.build_segments(corpus, d, n_segments=64, id_col="doc_id", text_col="content",
                     analyzer="code", n_docs_hint=20000, codec="for128")
    out[f"build_total_{i}"] = round(time.time()-t0,3)
# step-by-step on a fresh dir
d = tempfile.mkdtemp(prefix="prof_build_steps_")
base = corpus.select(F.col("doc_id").cast("long").alias("doc_id"), F.col("content").alias("_text")) \
             .withColumn("seg", (F.col("doc_id")/F.lit(313)).cast("int"))
fused = base.repartitionByRange(64, "seg").mapInPandas(S._fused_build_fn("code", False, "for128"), S.POSTINGS_SCHEMA)
t0=time.time()
fused.write.mode("overwrite").partitionBy("seg").parquet(os.path.join(d, "postings"))
out["fused_write"] = round(time.time()-t0,3)
t0=time.time()
sidecar = spark.read.parquet(os.path.join(d, "postings")).where(F.col("term")==S.DOCS_MARKER).persist()
docs_df = sidecar.mapInPandas(lambda it: (S._docs_from_sidecar(p) for p in it), S.DOCS_SCHEMA)
docs_df.write.mode("overwrite").option("partitionOverwriteMode","static").partitionBy("seg").parquet(os.path.join(d,"docs"))
out["docs_write"] = round(time.time()-t0,3)
t0=time.time()
norms = sidecar.mapInPandas(lambda it: (S._norms_from_sidecar(p) for p in it), S.NORMS_SCHEMA).persist()
norms.write.mode("overwrite").partitionBy("seg").parquet(os.path.join(d,"norms"))
out["norms_write"] = round(time.time()-t0,3)
t0=time.time()
sidecar.select("seg", F.col("df"), F.col("ttf"), F.col("block_max_tf")).collect()
norms.select("seg","doc_base").collect()
out["manifest_collects"] = round(time.time()-t0,3)
# fused compute alone (noop)
t0=time.time()
fused.write.format("noop").mode("overwrite").save()
out["fused_noop"] = round(time.time()-t0,3)
print(json.dumps(out))
spark.stop()
