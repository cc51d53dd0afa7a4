import os, sys, time, json
sys.path.insert(0, sys.argv[1])
os.chdir(sys.argv[1])
from lucene_solr_intervals_spark.session import get_spark
cpus = 32
spark = get_spark(app_name="df-ab", master=f"local[{cpus}]", shuffle_partitions=cpus*2)
spark.sparkContext.setLogLevel("ERROR")
from lucene_solr_intervals_spark.index.builder import build_index
from lucene_solr_intervals_spark.search.executor import Searcher
from lucene_solr_intervals_spark.search import queries as Q
docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
docs.count()
t0 = time.time()
idx = build_index(docs, analyzer="code")
build_t = round(time.time()-t0, 3)
s = Searcher(idx, mode="lucene")
qs = {
 "df_term": lambda: s.search(Q.Term("merge"), k=10).collect(),
 "df_bool_or": lambda: s.search(Q.Boolean(should=(Q.Term("vector"), Q.Term("window"))), k=10).collect(),
 "df_phrase": lambda: s.search(Q.Phrase(("table", "hash")), k=10).collect(),
 "df_sloppy": lambda: s.search(Q.Phrase(("table", "hash"), slop=4), k=10).collect(),
 "df_onear": lambda: s.search(Q.OrderedNear(3, (Q.Term("vector"), Q.Term("window"))), k=10).collect(),
 "df_unear": lambda: s.search(Q.UnorderedNear(2, (Q.Term("table"), Q.Term("hash"))), k=10).collect(),
}
out = {"build": build_t}
for rnd in range(2):
    for name, fn in qs.items():
        t0=time.time(); fn(); out[f"{name}_{rnd}"] = round(time.time()-t0,3)
print(json.dumps(out))
spark.stop()
