import os, sys, time, json
sys.path.insert(0, "/root/repo")
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.search import wand as W
import pandas as pd, numpy as np

spark = get_spark(app_name="prof-local2", master="local[4]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
idx = "/tmp/prof_local_idx20k"
ss = W.SegmentSearcher(spark, idx)
term = "get_index"
ss.search([term], k=10, mode="wand").collect()  # warm caches
weights = ss._weights([term]); cache = ss.cache; codec = ss.codec
segs = list(ss.live)
out = {}
# full _driver_topk warm
N=20
t0=time.time()
for _ in range(N):
    rows = W._driver_topk(idx, segs, [term], weights, cache, 10, "wand", False,
                          ss.tombstones, codec, ss._spilled, ss._scoring_meta, ss._snap_cache)
out["driver_topk_ms"] = round((time.time()-t0)/N*1000,2)
# isolate: read loop only (monkeypatch kernel to no-op)
orig = W.segment_topk_kernel
W.segment_topk_kernel = lambda *a, **k: W._EMPTY_TOPK
t0=time.time()
for _ in range(N):
    W._driver_topk(idx, segs, [term], weights, cache, 10, "wand", False,
                   ss.tombstones, codec, ss._spilled, ss._scoring_meta, ss._snap_cache)
out["read_loop_ms"] = round((time.time()-t0)/N*1000,2)
W.segment_topk_kernel = orig
out["kernel_ms"] = round(out["driver_topk_ms"] - out["read_loop_ms"],2)
# createDataFrame overhead
t0=time.time()
for _ in range(N):
    spark.createDataFrame(rows, schema=W.TOPK_SCHEMA).collect()
out["createDF_collect_ms"] = round((time.time()-t0)/N*1000,2)
# end-to-end warm search
t0=time.time()
for _ in range(N):
    ss.search([term], k=10, mode="wand").collect()
out["search_ms"] = round((time.time()-t0)/N*1000,2)
print(json.dumps(out))
spark.stop()
