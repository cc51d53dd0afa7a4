import os, sys, time, json, tempfile
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus
from lucene_solr_intervals_spark.index.segment import (
    build_segments, read_manifest, load_postings, load_docs, _postings_check_udf)

cpus = 32
spark = get_spark(app_name="prof-verify", master=f"local[{cpus}]", shuffle_partitions=cpus*2)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, 20000).persist(); corpus.count()
d = tempfile.mkdtemp(prefix="prof_verify_idx_")
build_segments(corpus, d, n_segments=64, id_col="doc_id", text_col="content",
               analyzer="code", n_docs_hint=20000, codec="for128")
manifest = read_manifest(d)
live = [s["seg"] for s in manifest["segments"] if s.get("status") == "done"]
postings = load_postings(spark, d).where(F.col("seg").isin(live))
out = {"n_posting_rows": postings.count()}
check = _postings_check_udf("for128")

def t(name, fn, reps=2):
    ts = []
    for _ in range(reps):
        t0 = time.time(); fn(); ts.append(round(time.time()-t0, 3))
    out[name] = ts

t("check_udf", lambda: postings.select(check("doc_ids","tfs","positions","df","ttf").alias("e")).where(F.col("e")!="").limit(20).collect())
docs = load_docs(spark, d).where(F.col("seg").isin(live))
t("docs_count", lambda: docs.count())
src = corpus.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.sha2(F.col("content").cast("binary"),256).alias("sha_src"))
t("sha_join", lambda: docs.select("doc_id","sha256").join(src,"doc_id","inner").where(F.col("sha256")!=F.col("sha_src")).count())
# scan cost floor: read all binary columns, no python
t("scan_noop", lambda: postings.select("doc_ids","tfs","positions","df","ttf").write.format("noop").mode("overwrite").save())
print(json.dumps(out))
spark.stop()
