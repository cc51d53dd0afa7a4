import os, sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
spark = get_spark(app_name="prof-df", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search.executor import Searcher
from lucene_solr_intervals_spark.search import queries as Q
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet"); docs.count()
idx = build_index(docs, analyzer="code")
s = Searcher(idx, mode="lucene")
out = {}
def t(name, fn, reps=3):
    ts = []
    for _ in range(reps):
        t0=time.time(); fn(); ts.append(round(time.time()-t0,3))
    out[name]=ts
# warm codegen shapes
s.search(Q.Term("merge"), k=10).collect()
s.search(Q.Boolean(should=(Q.Term("vector"), Q.Term("window"))), k=10).collect()
s.search(Q.Phrase(("table","hash")), k=10).collect()

t("term", lambda: s.search(Q.Term("merge"), k=10).collect())
t("bool_or", lambda: s.search(Q.Boolean(should=(Q.Term("vector"), Q.Term("window"))), k=10).collect())
t("phrase", lambda: s.search(Q.Phrase(("table","hash")), k=10).collect())
# components
t("term_hits_2", lambda: s.term_hits(["vector","window"]).write.format("noop").mode("overwrite").save())
t("term_hits_pos", lambda: s.term_hits(["table","hash"], with_positions=True).write.format("noop").mode("overwrite").save())
t("stats_collect", lambda: idx.term_stats.where((F.col("field")=="text") & F.col("term").isin(["table","hash"])).collect())
req = (idx.postings.where((F.col("field")=="text") & F.col("term").isin(["hash","table"]))
       .groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).where(F.col("n")==2).select("doc_id"))
t("required_semi", lambda: req.write.format("noop").mode("overwrite").save())
print(json.dumps(out))
spark.stop()
