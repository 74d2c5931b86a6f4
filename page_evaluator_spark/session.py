"""SparkSession factory with scale-oriented defaults.

Designed for a 1000-executor cluster reading 100 TB; tested on local[N].
Every knob here exists for a reason at scale:
  * AQE on (runtime coalescing + skew-join splitting),
  * bounded Arrow batches so a batch of large documents cannot OOM a Python
    worker (parse-UDF memory ∝ batch_rows × doc_size, SURVEY.md §4.1),
  * shuffle partitions sized for the local test harness (overridden by AQE),
  * Arrow-optimized Python UDF transport throughout.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "page-evaluator-spark", master: str | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch_rows: int = 4096) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", None)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus != "*" else os.cpu_count() or 8
        shuffle_partitions = max(int(n), 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Cap Arrow batch row count: parse-UDF batches hold whole page texts,
        # so the bound is rows × page_size, not rows alone.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        # 128 MB input splits — reasonable parquet scan granularity at 100 TB.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        # java.util.Properties.put is last-wins; str_to_map must match
        # (HOCRToken.java:20-29 title parse — duplicate keys keep the last)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # throughput GC: the pipeline allocates short-lived strings at a high
        # rate across many task threads; ParallelGC burns measurably less CPU
        # than G1's concurrent phases on this allocation profile
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    # executors must be able to unpickle the Arrow kernels no matter where
    # the driver was launched from (spark-submit --py-files also covers this;
    # addPyFile is the belt-and-braces for harness-built sessions)
    from .shipping import ensure_shipped

    ensure_shipped(spark)
    return spark
