"""Delta Lake table-format path (north star: "Spark reads/writes
over S3 with Delta/Iceberg table formats").

The harness image ships parquet only (no delta-spark jar/package),
so every Delta feature is gated behind an import-try: with
delta-spark on the classpath `HAVE_DELTA` flips true and the same
call sites use ACID MERGE/append; without it, the parquet fallbacks
implement the identical logical semantics (the oracle-checked
operators in operators/scd2.py and operators/state_delta.py).

Production mapping (what HAVE_DELTA enables):
* SCD2 close-out+insert  → one ``DeltaTable.merge`` transaction
  (whenMatchedUpdate set actv_flg='N' + insert-all), file-pruned by
  the transaction log's min/max stats.
* State upsert           → ``merge.whenMatchedUpdateAll.
  whenNotMatchedInsertAll`` keyed (_id, reference_id).
* Drift                  → ``option("mergeSchema", "true")`` on
  append — the reference itself uses exactly this
  (/root/reference/great_expectations.py:337-338).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - delta-spark not in the harness image
    from delta.tables import DeltaTable  # type: ignore

    HAVE_DELTA = True
except ImportError:
    DeltaTable = None  # type: ignore[assignment]
    HAVE_DELTA = False


def write_table(df: DataFrame, path: str, mode: str = "overwrite",
                merge_schema: bool = False) -> None:
    """Delta write when available, parquet otherwise (same layout
    semantics; parquet lacks the transaction log only)."""
    w = df.write.mode(mode)
    if merge_schema:
        w = w.option("mergeSchema", "true")
    w.format("delta" if HAVE_DELTA else "parquet").save(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format("delta" if HAVE_DELTA else "parquet").load(path)


def upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    keys: list[str],
) -> None:
    """Keyed upsert (SURVEY.md S21). Delta: one ACID MERGE. A native
    txn_table (sources/txn_table.py) gets the same file-pruned MERGE
    from our own commit log. Flat-parquet fallback: anti-join + union
    rewrite — logically identical, but full-table rewrite, which is
    exactly the gap the transaction log closes at scale."""
    if not HAVE_DELTA:
        from aws_datalake_spark.sources import txn_table

        if txn_table.is_txn_table(target_path):
            txn_table.merge_upsert(spark, target_path, updates, keys)
            return
    if HAVE_DELTA:
        tgt = DeltaTable.forPath(spark, target_path)
        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        (
            tgt.alias("t")
            .merge(updates.alias("s"), cond)
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        return
    current = spark.read.parquet(target_path)
    kept = current.join(updates.select(*keys), keys, "left_anti")
    merged = kept.unionByName(updates)
    # two-phase write: parquet has no txn log, so stage then swap
    tmp = target_path.rstrip("/") + "__stage"
    merged.write.mode("overwrite").parquet(tmp)
    restored = spark.read.parquet(tmp)
    restored.write.mode("overwrite").parquet(target_path)
