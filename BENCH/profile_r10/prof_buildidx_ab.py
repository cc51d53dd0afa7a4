import os, sys, time, json
sys.path.insert(0, os.environ["LSI_TREE"])
from pyspark.sql import functions as F
from lucene_solr_intervals_spark.session import get_spark
from lucene_solr_intervals_spark.index.builder import build_index
import pandas as pd

spark = get_spark(app_name="prof-bidx", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
# same warm-up as bench
@F.pandas_udf("double")
def _warm(x: pd.Series) -> pd.Series:
    import numpy
    return x.astype("float64")
spark.range(0, 128, numPartitions=128).select(_warm(F.col("id"))).count()

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
docs.count()
out = {}
for i in range(3):
    t0 = time.time()
    idx = build_index(docs, analyzer="code")
    out[f"build_{i}"] = round(time.time()-t0, 3)
    idx.unpersist()
print(json.dumps(out))
spark.stop()
