import os, sys, time, json
slots = os.environ.get("LSI_DRIVER_EXEC_SLOTS", "1")
sys.path.insert(0, "/root/repo")
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.search import wand as W
from lucene_solr_intervals_spark.corpus import VOCAB
from concurrent.futures import ThreadPoolExecutor

spark = get_spark(app_name="prof-conc", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
idx = "/tmp/prof_local_idx20k"
ss = W.SegmentSearcher(spark, idx)
conc_terms = [VOCAB[i] for i in range(0, 240, 10)]
out = {"slots": slots}
for rep in range(3):
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=12) as ex:
        list(ex.map(lambda t: ss.search([t], k=10, mode="wand").collect(), conc_terms))
    out[f"x24_{rep}"] = round(time.time() - t0, 3)
print(json.dumps(out))
spark.stop()
