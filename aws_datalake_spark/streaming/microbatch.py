"""Micro-batch hooks (SURVEY.md ST1/ST2).

Reference: validation invoked once per micro-batch with
(batchID, batchDf) (/root/reference/great_expectations.py:238,
great_expectation_microbatch.py:16) — the foreachBatch pattern.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from aws_datalake_spark.operators.dq import Expectation, evaluate


def dq_foreach_batch(
    expectations: list[Expectation],
    audit_sink_path: str,
    file_identifier: str = "stream",
) -> Callable[[DataFrame, int], None]:
    """Build the foreachBatch body: evaluate the expectation suite on
    the batch and append audit rows to the results sink
    (great_expectations.py:312-338)."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        audit = evaluate(batch_df, expectations, file_identifier, batch_id)
        audit.write.mode("append").parquet(audit_sink_path)

    return _body


def run_stream_with_dq(
    stream_df: DataFrame,
    expectations: list[Expectation],
    audit_sink_path: str,
    checkpoint_path: str,
    query_name: str = "dq_stream",
    file_identifier: str = "stream",
) -> StreamingQuery:
    """writeStream.foreachBatch wiring with checkpointing — the
    reference's checkpointed validation run
    (great_expectations.py:302-310)."""
    return (
        stream_df.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(dq_foreach_batch(expectations, audit_sink_path, file_identifier))
        .start()
    )


def idempotent_batch_sink(
    out_path: str,
) -> Callable[[DataFrame, int], None]:
    """Exactly-once foreachBatch sink on an at-least-once substrate:
    every batch writes to its own ``batch_id=N`` hive partition with
    dynamic partition overwrite, so a replayed batch (restart between
    sink write and checkpoint commit) REPLACES its own partition
    instead of appending duplicates. Readers see the union of
    partitions — each batch exactly once.

    This is the parquet twin of Delta's txn-log dedup; same contract,
    coarser granularity (partition vs file)."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(out_path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return _body


def incremental_rollup_sink(
    rollup_path: str,
    ts_col: str = "ts",
    value_col: str = "value",
    scale: int = 6,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body that incrementally maintains an hourly
    rollup table: per batch, aggregate only the batch's rows, union
    with the stored partials FOR THE TOUCHED HOURS, re-aggregate, and
    dynamic-partition-overwrite just those hour partitions.

    This is the streaming half of st_hourly_daily_rollup (queries/
    streaming_batch.py): the hourly table stays exact under
    micro-batch appends because partial sums are scaled BIGINTs
    (integer addition is associative/commutative), and each batch
    touches O(batch hours) partitions, never the full table. Replayed
    batches are NOT idempotent under plain parquet (the re-agg adds
    the batch twice) — production pairs this with Delta MERGE keyed
    on hour, or the batch_id-partition dedup of idempotent_batch_sink;
    with exactly-once foreachBatch delivery (checkpointed) it is
    correct as written.
    """
    from pyspark.sql import functions as F

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        m = float(10**scale)
        partial = batch_df.groupBy(
            F.date_trunc("hour", ts_col).alias("hour")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col(value_col) * F.lit(m), 0).cast("long")).alias(
                "sum_s"
            ),
        )
        try:
            existing = spark.read.parquet(rollup_path).select(
                "hour", "n_events", "sum_s"
            )
            have_existing = True
        except Exception:
            have_existing = False
        if have_existing:
            touched = [r.hour for r in partial.select("hour").distinct().collect()]
            overlap = existing.filter(F.col("hour").isin(touched))
            merged = (
                overlap.unionByName(partial)
                .groupBy("hour")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_s").alias("sum_s"),
                )
            )
        else:
            merged = partial
        # materialize before the write: the merged plan reads the same
        # path it is about to overwrite (self-overwrite is rejected at
        # analysis time otherwise). Delta MERGE removes this dance.
        merged = merged.localCheckpoint(eager=True)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        (
            merged.withColumn("hour_part", F.date_format("hour", "yyyyMMddHH"))
            .write.mode("overwrite")
            .partitionBy("hour_part")
            .parquet(rollup_path)
        )

    return _body


def run_incremental_rollup(
    stream_df: DataFrame,
    rollup_path: str,
    checkpoint_path: str,
    query_name: str = "rollup_stream",
) -> StreamingQuery:
    """writeStream wiring for incremental_rollup_sink: checkpointed
    foreachBatch, so batch delivery is exactly-once and the hourly
    table stays consistent across restarts."""
    return (
        stream_df.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(incremental_rollup_sink(rollup_path))
        .start()
    )


def quarantine_foreach_batch(
    expectations: list[Expectation],
    good_sink_path: str,
    quarantine_sink_path: str,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch body for the validate-and-divert pattern: rows
    passing every scalar expectation append to the main sink; rows
    violating any rule append to the quarantine sink with a
    ``batch_id`` and their ``__reasons`` (operators/dq.py:quarantine)
    — the stream never stops for bad data, and nothing is dropped
    silently. Replays are safe per micro-batch: both writes are
    append-only and keyed by batch_id for downstream dedup."""
    from pyspark.sql import functions as F

    from aws_datalake_spark.operators.dq import quarantine

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        good, bad = quarantine(batch_df, expectations)
        good.write.mode("append").parquet(good_sink_path)
        (
            bad.withColumn("batch_id", F.lit(int(batch_id)))
            .withColumn("__reasons", F.array_join("__reasons", ","))
            .write.mode("append")
            .parquet(quarantine_sink_path)
        )

    return _body


def snapshot_enrich_sink(
    dim_root: str,
    out_sink: Callable[[DataFrame, int], None],
    on: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> Callable[[DataFrame, int], None]:
    """Stream-static enrichment where the static side is a
    transaction-log table re-resolved EVERY micro-batch: a plain
    stream-static join binds the dimension's file list once at query
    start, so upstream dimension updates (SCD feeds, config pushes)
    are invisible until restart; resolving through the txn snapshot
    inside foreachBatch picks up each new committed version at batch
    granularity — Delta's recommended "join the latest snapshot"
    pattern, on our own log.

    The dimension read is snapshot-ATOMIC (a mid-batch commit flips
    the whole file set or none of it, never a torn mix), and
    `broadcast_dim` keeps the join shuffle-free for dim tables that
    fit the broadcast threshold — the common case for enrichment
    dims. Compose with stream_append_sink / idempotent_batch_sink as
    ``out_sink`` for the exactly-once write half."""

    def _body(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        from aws_datalake_spark.sources import txn_table as tt

        dim = tt.read(batch_df.sparkSession, dim_root)
        if broadcast_dim:
            dim = F.broadcast(dim)
        enriched = batch_df.join(dim, on=on, how=how)
        out_sink(enriched, batch_id)

    return _body


def corpus_ingest_sink(root: str, min_quality: float = 0.5):
    """foreachBatch body for STREAMING corpus curation — the LLM
    ingest loop composed from tested parts: each micro-batch is
    quality-scored (operators/text.py:quality_score) and filtered,
    deduplicated exactly WITHIN the batch (keep lowest doc_id per
    normalized text) and ACROSS batches (anti-join against the
    sink's already-ingested text hashes — a column-pruned scan of
    8-byte hashes, never of text), then appended to the txn table as
    one atomic commit under the stream-batch ledger (replays no-op).

    At 100 TB the cross-batch check reads only the hash column of the
    corpus (Parquet column pruning); the documented upgrade is a
    dedicated fingerprint table maintained in the same batch (see
    llm_incremental_dedup's batch twin), traded here for
    single-table atomicity."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from aws_datalake_spark.operators.text import (
        hash60,
        normalize_text,
        quality_score,
    )
    from aws_datalake_spark.sources import txn_table as tt

    def _body(batch_df, batch_id: int) -> None:
        if batch_id in tt.committed_stream_batches(root):
            return  # replay: already durable
        spark = batch_df.sparkSession
        scored = quality_score(batch_df)
        good = scored.filter(
            F.col("quality_score") >= F.lit(min_quality)
        ).select(*batch_df.columns)
        good = good.withColumn("__h", hash60(normalize_text(F.col("text"))))
        w = Window.partitionBy("__h").orderBy("doc_id")
        good = (
            good.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        if tt.is_txn_table(root):
            seen = tt.read(spark, root).select(
                hash60(normalize_text(F.col("text"))).alias("__h")
            ).dropDuplicates()
            good = good.join(seen, "__h", "left_anti")
        good = good.drop("__h")
        schema = tt._check_schema(good, root, "append", merge_schema=False)
        # a fully-filtered batch still records its ledger entry (the
        # exactly-once contract) without polluting the table with an
        # empty file
        add = tt._write_data(good, root) if good.limit(1).count() else []
        tt._commit(root, "stream-append", add, [],
                   extra={"stream_batch_id": batch_id, "schema": schema})

    return _body
