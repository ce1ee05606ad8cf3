"""SparkSession construction with the pipeline's tuned configuration.

The Arrow batch size is the Spark analog of redeye's --input-buffer
(src/bin/redeye.rs:47-53): it bounds the unit of work crossing the
JVM→Python boundary. AQE is on for runtime coalesce + skew-join splitting;
hot-key *aggregation* skew is additionally handled by explicit salting in
operators/aggregate.py (north_rule requires explicit skew mitigation).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # ~10k rows/batch: large enough to amortize Arrow IPC + regex setup,
    # small enough to keep per-batch memory bounded at wide rows.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Parquet scans: keep splits big enough that the regex UDF dominates,
    # not task scheduling; 128 MiB default is right at cluster scale.
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    # Dynamic partition overwrite: checkpointed chunks re-commit
    # idempotently by overwriting only their own partitions.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
}


def get_spark(
    app_name: str = "redeye_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    master defaults to $SPARK_GRAFT_MASTER or local[$SPARK_GRAFT_CPUS];
    on a real cluster pass None and let spark-submit own it.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
