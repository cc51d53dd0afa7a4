import os, sys, time, json, tempfile
sys.path.insert(0, os.environ["LSI_TREE"])
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus
from lucene_solr_intervals_spark.index import segment as S
spark = get_spark(app_name="ab-build", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, 20000).persist(); corpus.count()
out = {"tree": os.environ["LSI_TREE"]}
for i in range(3):
    d = tempfile.mkdtemp(prefix="ab_build_idx_")
    t0 = time.time()
    S.build_segments(corpus, d, n_segments=64, id_col="doc_id", text_col="content",
                     analyzer="code", n_docs_hint=20000, codec="for128")
    out[f"build_{i}"] = round(time.time() - t0, 3)
    import shutil; shutil.rmtree(d, ignore_errors=True)
print(json.dumps(out))
spark.stop()
