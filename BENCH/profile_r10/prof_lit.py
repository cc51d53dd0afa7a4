import os, sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
spark = get_spark(app_name="prof-lit", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search.executor import Searcher
from lucene_solr_intervals_spark.search import queries as Q
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet"); docs.count()
idx = build_index(docs, analyzer="code")
s = Searcher(idx, mode="lucene")
out = {}
# literal-stats term query (current code)
s.search(Q.Term("merge"), k=10).collect()
# old-style term query inline
def term_old(t="merge", k=10):
    f = "text"
    stats = idx.term_stats.where((F.col("field")==f) & F.col("term").isin([t])).select("term","df","ttf")
    hits = (idx.postings.where((F.col("field")==f) & F.col("term").isin([t]))
            .select("term","doc_id","tf")
            .join(F.broadcast(stats), "term")
            .join(idx.docs.where(F.col("field")==f).select("doc_id","doclen","norm_byte"), "doc_id"))
    score = s._lucene_score_udf(f)(F.col("tf"), F.col("norm_byte"), F.col("df"))
    hits = hits.withColumn("score", score).select("doc_id", (F.col("score")*F.lit(1.0)).alias("score"))
    return hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
term_old().collect()
# createDataFrame cost alone
t0=time.time()
for _ in range(5):
    spark.createDataFrame([("merge", 100, 200)], "term string, df bigint, ttf bigint")
out["createDataFrame_x5_lazy"] = round(time.time()-t0,3)
res = {"new": [], "old": []}
for i in range(4):
    t0=time.time(); s.search(Q.Term("merge"), k=10).collect(); res["new"].append(round(time.time()-t0,3))
    t0=time.time(); term_old().collect(); res["old"].append(round(time.time()-t0,3))
out.update(res)
print(json.dumps(out))
spark.stop()
