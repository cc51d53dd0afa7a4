import os, sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.index.builder import tokenize_agg_expr
import pandas as pd

spark = get_spark(app_name="prof-bidx2", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
@F.pandas_udf("double")
def _warm(x: pd.Series) -> pd.Series:
    import numpy
    return x.astype("float64")
spark.range(0, 128, numPartitions=128).select(_warm(F.col("id"))).count()

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
t = {}
t0=time.time(); n = docs.count(); t["docs_count"]=round(time.time()-t0,3)

tok_agg = tokenize_agg_expr("code")
tokenized = docs.select(
    F.col("doc_id").cast("long").alias("doc_id"),
    F.lit("text").alias("field"),
    tok_agg(F.col("text")).alias("t"),
).select("doc_id","field","t.terms","t.tfs","t.positions","t.doclen","t.norm_byte").persist()
t0=time.time(); tokenized.count(); t["tokenized_materialize"]=round(time.time()-t0,3)

docs_rel = tokenized.select("doc_id","field","doclen","norm_byte").persist()
postings = tokenized.select("doc_id","field",
    F.explode(F.arrays_zip("terms","tfs","positions")).alias("o")).select(
    "field", F.col("o.terms").alias("term"), "doc_id",
    F.col("o.tfs").alias("tf"), F.col("o.positions").alias("positions")).persist()
term_stats = postings.groupBy("field","term").agg(
    F.count(F.lit(1)).alias("df"), F.sum("tf").alias("ttf")).persist()

t0=time.time(); rows = docs_rel.groupBy("field").agg(F.count(F.lit(1)).alias("n")).collect(); t["docs_agg_collect"]=round(time.time()-t0,3)
t0=time.time(); stat = term_stats.groupBy("field").agg(F.coalesce(F.sum("ttf"),F.lit(0)).alias("s")).collect(); t["stats_agg_collect"]=round(time.time()-t0,3)
print(json.dumps(t))
spark.stop()
