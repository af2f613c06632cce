"""End-to-end pipeline composition (SURVEY.md §3 lifecycle parity).

The reference's stages communicate through S3 zone files:
raw JSON → (rules/explode/pad/state) → pipe-CSV → (COPY + SCD2) →
warehouse (/root/reference/transformation.py:246-416,
loading.py:25-133). These builders chain the same operators over
ZonePaths directories; each stage is a handful of narrow Spark jobs,
and the per-row DynamoDB RPC of the reference
(transformation.py:407) is two set-based operations.

All state lives in tables (parquet locally, Delta in production via
sources/delta_io.py) — reruns are idempotent per zone overwrite.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_datalake_spark.operators.nested import explode_child
from aws_datalake_spark.operators.rules import Rule, compile_rules
from aws_datalake_spark.operators.scalar import (
    add_audit_ts,
    add_generic_padding,
    project_final,
)
from aws_datalake_spark.operators.scd2 import scd2_merge
from aws_datalake_spark.operators.state_delta import compute_deltas, upsert_state
from aws_datalake_spark.sources.readers import read_json_docs, read_pipe_staging
from aws_datalake_spark.sources.writers import cast_void_to_string, write_pipe_csv


@dataclass
class TransformationJob:
    """§3.2 transformation stage config (the DynamoDB rule items,
    transformation.py:457-462, as plain data)."""

    rules: list[Rule]
    final_columns: list[str]
    key_cols: list[str] = field(default_factory=lambda: ["_id", "reference_id"])
    metric_cols: list[str] = field(default_factory=list)
    child_arrays: dict[str, str] = field(default_factory=dict)  # out-name -> array path
    generic_padding: int = 10
    # historical backfill date (ingestion.py:28-36): insrt_ts = date+1s
    # instead of now() — also what makes a pipeline run reproducible
    historical_date: str | None = None


def run_transformation(
    spark: SparkSession,
    raw_path: str,
    out_path: str,
    job: TransformationJob,
    state_path: str | None = None,
    schema=None,
    multi_line: bool = True,
) -> dict[str, DataFrame]:
    """raw JSON → rule projection → child-table explodes → padding +
    audit ts → stateful delta (join + state upsert, NOT per-row RPC)
    → pipe-CSV zone write. Returns the written frames by name.

    ``multi_line=True`` matches the reference's pretty-printed raw
    arrays; pass False for JSONL zones (one doc per line — the layout
    that actually splits across executors at scale)."""
    raw = read_json_docs(spark, raw_path, schema=schema, multi_line=multi_line)
    main = compile_rules(raw, job.rules)

    outputs: dict[str, DataFrame] = {}
    for name, array_path in job.child_arrays.items():
        child = explode_child(raw, array_path, parent_keys=job.key_cols[:1])
        outputs[name] = child

    main = add_generic_padding(main, n=job.generic_padding)
    main = add_audit_ts(main, historical_date=job.historical_date)

    if job.metric_cols:
        if state_path is not None:
            try:
                state = spark.read.parquet(state_path)
            except Exception:
                state = None
        else:
            state = None
        main = compute_deltas(main, state, job.key_cols, job.metric_cols)
        main = cast_void_to_string(
            project_final(main, [c for c in job.final_columns if c in main.columns])
        )
        write_pipe_csv(main, out_path)
        if state_path is not None:
            # Both consumers of the OLD state (deltas above, upsert
            # below) must materialize before the state table is
            # overwritten — lazy plans hold file references, and
            # parquet has no transaction log to protect readers
            # (Delta MERGE replaces this stage-then-swap wholesale
            # in production, sources/delta_io.py).
            new_state = upsert_state(
                raw.select(
                    *[r.to_column(raw) for r in job.rules],
                ).select(*job.key_cols, *job.metric_cols),
                state,
                job.key_cols,
                job.metric_cols,
            )
            tmp = state_path.rstrip("/") + "__stage"
            new_state.write.mode("overwrite").parquet(tmp)
            spark.read.parquet(tmp).write.mode("overwrite").parquet(state_path)
    else:
        main = cast_void_to_string(
            project_final(main, [c for c in job.final_columns if c in main.columns])
        )
        write_pipe_csv(main, out_path)

    outputs["main"] = spark.read.option("sep", "|").option("header", True).schema(
        main.schema
    ).csv(out_path)
    return outputs


def run_loading(
    spark: SparkSession,
    staging_path: str,
    target_path: str,
    keys: list[str],
    staging_schema: str,
    columnwise_keys: bool = False,
) -> DataFrame:
    """§3.3 loading stage: pipe-CSV staging read (the COPY twin,
    loading.py:26-30) → SCD2 close-out + unconditional re-insert
    (loading.py:32-130) → target overwrite. Returns the post-merge
    table."""
    staging = read_pipe_staging(spark, staging_path, schema=staging_schema)
    try:
        target = spark.read.parquet(target_path)
        first_load = False
    except Exception:
        first_load = True

    if first_load:
        merged = staging.withColumn("actv_flg", F.lit("Y")).withColumn(
            "record_to", F.lit(None).cast("timestamp")
        )
    else:
        merged = scd2_merge(target, staging, keys, columnwise_keys=columnwise_keys)

    tmp = target_path.rstrip("/") + "__stage"
    merged.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite").parquet(target_path)
    return spark.read.parquet(target_path)


def run_masking(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    masking_cols: list[str],
    fmt: str = "parquet",
) -> DataFrame:
    """§ masking/zone-copy stage (/root/reference/partitioning.py:
    54-69): copy a dataset between zones with the configured columns
    dropped. A distributed read→drop→write, not the reference's
    per-object driver loop; missing mask columns are ignored like the
    reference's dict.pop(col, None)."""
    from aws_datalake_spark.operators.scalar import mask_columns

    df = spark.read.format(fmt).load(in_path)
    present = [c for c in masking_cols if c in df.columns]
    masked = mask_columns(df, present)
    masked.write.mode("overwrite").format(fmt).save(out_path)
    return spark.read.format(fmt).load(out_path)


@dataclass
class EntityLoad:
    """One entity's loading config (a load_<entity> branch,
    loading.py:2012-2135, as plain data)."""

    staging_path: str
    keys: list[str]
    staging_schema: str
    columnwise_keys: bool = False
    # fixed close-out timestamp ('YYYY-MM-DD HH:MM:SS'); None = now().
    # Batch loads that must be replayable (and oracle-checkable) pin it.
    close_ts: str | None = None


def run_batch_load(
    spark: SparkSession,
    root: str,
    batch_id: str,
    entities: dict[str, EntityLoad],
) -> int:
    """§3.3 full-batch loading with the reference's single-commit
    visibility (loading.py:2137): every entity's SCD2 merge is staged
    under ``batch=<id>`` paths (invisible), then ONE manifest flip
    publishes the whole batch — readers see all 19 entities' new
    versions or none. Returns the manifest version.

    Each entity merges against its currently-PUBLISHED version, so a
    crashed half-staged batch can simply be re-run: staging writes
    are per-batch paths (idempotent overwrite), and nothing was
    visible.
    """
    from aws_datalake_spark.sources.publish import (
        publish,
        read_published,
        stage_table,
    )

    staged: dict[str, str] = {}
    for name, cfg in entities.items():
        staging = read_pipe_staging(spark, cfg.staging_path, schema=cfg.staging_schema)
        try:
            target = read_published(spark, root, name)
            merged = scd2_merge(
                target,
                staging,
                cfg.keys,
                close_ts=(
                    F.lit(cfg.close_ts).cast("timestamp")
                    if cfg.close_ts is not None
                    else None
                ),
                columnwise_keys=cfg.columnwise_keys,
            )
        except KeyError:
            merged = staging.withColumn("actv_flg", F.lit("Y")).withColumn(
                "record_to", F.lit(None).cast("timestamp")
            )
        stage_table(merged, root, name, batch_id)
        staged[name] = batch_id
    return publish(root, staged)
