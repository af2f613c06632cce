"""Small-files compaction + clustered writes (100 TB hygiene).

Streaming sinks and per-day micro-batches leave thousands of small
files per partition; scan throughput collapses (one task per file,
footer overhead per file). Delta OPTIMIZE solves this in production;
this is the format-agnostic equivalent.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def dir_size_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def compact(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet dataset into ~target-sized files, optionally
    sorted within files so min/max stats prune effectively (the
    OPTIMIZE ... ZORDER stand-in is a plain clustering sort).
    Returns the new file count. Stage-then-swap (no txn log)."""
    df = spark.read.parquet(path)
    n = max(1, math.ceil(dir_size_bytes(path) / (target_file_mb * 1024 * 1024)))
    out = df.repartition(n)
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    tmp = path.rstrip("/") + "__compact"
    out.write.mode("overwrite").parquet(tmp)
    staged = spark.read.parquet(tmp)
    staged.write.mode("overwrite").parquet(path)
    return n


def clustered_write(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned write with in-file clustering: repartition on
    the partition columns (one writer task per partition value — no
    small-file explosion from N tasks x M partitions), then sort
    within partitions so parquet row-group stats line up with the
    cluster columns."""
    (
        df.repartition(*partition_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode(mode)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def zorder_key(col_a, col_b, bits: int = 21):
    """Morton (Z-order) key interleaving the low ``bits`` of two
    non-negative int columns — sortWithinPartitions on this key
    clusters files for BOTH dimensions, so min/max row-group stats
    prune range predicates on either column (the open-source
    equivalent of Delta's OPTIMIZE ZORDER BY (a, b)).

    Columns must be pre-scaled to [0, 2^bits); 21+21 bits fit a
    BIGINT with headroom."""
    from pyspark.sql import functions as F

    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    key = None
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1)).cast("long")
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1)).cast("long")
        term = F.shiftleft(abit, 2 * i) + F.shiftleft(bbit, 2 * i + 1)
        key = term if key is None else key + term
    return key
