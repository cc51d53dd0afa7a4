"""SparkSession helper with engine-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lucene-solr-intervals-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # at least 2 waves of tasks per core at bench scale; explicit because
        # the 200 default is wrong in both directions depending on SF
        shuffle_partitions = max(cpus * 2, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Pin the session timezone: date-math resolves bounds driver-side
        # with naive datetimes (ops/datemath.py) and compares the Python
        # epoch against Spark timestamp literals — on a non-UTC host the
        # two would disagree by the UTC offset unless both sides are UTC.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # v2 commit: tasks rename their own output files on commit instead
        # of a single-threaded driver rename pass — the driver-serial part
        # of every parquet write, which is what caps build-phase scaling.
        # Trade-off (deliberate): v1's job-level atomicity is lost, so a
        # FAILED build job can leave partially-committed files in
        # postings/norms partition directories.  Correctness is preserved
        # by the manifest: a segment only becomes visible when its manifest
        # entry reaches status="done" (readers filter on it), and rebuilds
        # overwrite the same partition dirs; stray files from a crashed job
        # waste space until then but are never read.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
