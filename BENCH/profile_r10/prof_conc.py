import os, sys, time, json, tempfile
sys.path.insert(0, "/root/repo")
from concurrent.futures import ThreadPoolExecutor
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.corpus import generate_corpus, VOCAB
from lucene_solr_intervals_spark.index.segment import build_segments
from lucene_solr_intervals_spark.search.wand import SegmentSearcher

cpus = 32
spark = get_spark(app_name="prof-conc", master=f"local[{cpus}]", shuffle_partitions=cpus*2)
spark.sparkContext.setLogLevel("ERROR")
corpus = generate_corpus(spark, 20000).persist(); corpus.count()
d = tempfile.mkdtemp(prefix="prof_conc_idx_")
build_segments(corpus, d, n_segments=64, id_col="doc_id", text_col="content",
               analyzer="code", n_docs_hint=20000, codec="for128")
ss = SegmentSearcher(spark, d)
ss.search(["warmup_zzz"], k=10).collect()
conc_terms = [VOCAB[i] for i in range(0, 240, 10)]
out = {}
def conc():
    with ThreadPoolExecutor(max_workers=12) as ex:
        list(ex.map(lambda t: ss.search([t], k=10, mode="wand").collect(), conc_terms))
for rep in range(3):
    # fresh memo each rep = the bench's cold-memo shape
    ss._df_memo = {}
    t0=time.time(); conc(); out.setdefault("concurrent_cold_memo", []).append(round(time.time()-t0,3))
t0=time.time(); conc(); out["concurrent_warm_memo"]=round(time.time()-t0,3)
# batch
batch_terms = [VOCAB[i] for i in range(0, 4000)]
ss.search_many(batch_terms, k=10).count()
t0=time.time(); ss.search_many(batch_terms, k=10).count(); out["batch_x4000_warm"]=round(time.time()-t0,3)
print(json.dumps(out))
spark.stop()
