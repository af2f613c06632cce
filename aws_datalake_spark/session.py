"""SparkSession factory with scale-oriented defaults.

The reference pipeline is a single-process pandas loop with no
execution tuning (SURVEY.md §4). Here every session enables the
Spark features that matter at 100 TB:

* AQE (runtime coalescing, skew-join splitting, dynamic join
  strategy switch) — replaces hand-tuned shuffle partition counts.
* Arrow — vectorized Python<->JVM transfer for the few operators
  that genuinely need pandas (crypto UDFs, multimodal decode).
* Auto broadcast — small dims (region/nation/state tables) never
  shuffle the big side.

On a real cluster the same builder is used with ``master`` left to
spark-submit; locally tests pass ``local[n]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the local[32] / 128 GiB test harness; on a
# 1000-executor cluster the same conf names are what you'd tune —
# AQE coalescing makes the initial shuffle count non-critical.
_DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    # events.parquet carries TIMESTAMP(NANOS) which the vectorized
    # reader rejects; read as long and convert in catalog.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "aws_datalake_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's conf presets.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset so
    the same entry point works in tests and under the driver harness.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    conf = dict(_DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def object_store_conf() -> dict[str, str]:
    """Conf preset for running the same code over S3/object storage
    (the deployment the reference targets with boto3 puts; here it is
    the S3A connector + zero-rename committers). Not applied by
    default: the cloud committer classes (hadoop-cloud module) are
    not on the local test classpath — pass to
    ``get_spark(extra_conf=object_store_conf())`` on a cluster.

    Why each matters at 100 TB:
    * magic committer — task commit is an S3 multipart-complete, not
      a rename (S3 has no rename; copy-based commit is O(bytes)).
    * directory markers kept — avoids O(files) DELETE storms on deep
      trees (safe when all readers are marker-aware).
    * bounded connection pool / fast upload — steady-state PUT
      throughput from wide executors.
    * no parquet summary metadata — writing _metadata serializes the
      job commit on one task at large file counts.
    """
    return {
        "spark.hadoop.fs.s3a.committer.name": "magic",
        "spark.hadoop.mapreduce.outputcommitter.factory.scheme.s3a": (
            "org.apache.hadoop.fs.s3a.commit.S3ACommitterFactory"
        ),
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
        "spark.hadoop.fs.s3a.connection.maximum": "96",
        "spark.hadoop.fs.s3a.fast.upload": "true",
        "spark.hadoop.fs.s3a.directory.marker.retention": "keep",
        "spark.hadoop.parquet.enable.summary-metadata": "false",
    }
