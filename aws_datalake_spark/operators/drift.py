"""Schema-drift reconciliation + config write-back (SURVEY.md P15/S19).

Reference semantics (/root/reference/ingestion.py:84-123): normalize
incoming column names; diff against the config-declared column list;
APPEND newly-seen columns to the config (write-back,
ingestion.py:44-57,99-102); materialize config columns missing from
the data as NULL (ingestion.py:103-104); project to config order
(ingestion.py:123).

The config store here is a JSON file (stand-in for the reference's
DynamoDB item) — see sources/config_store.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_datalake_spark.operators.scalar import normalize_column_names


@dataclass
class DriftResult:
    df: DataFrame
    columns: list[str]          # post-reconciliation config order
    added_to_config: list[str]  # new columns appended (write-back payload)
    filled_null: list[str]      # config columns absent in the data


def reconcile_schema(df: DataFrame, expected_columns: list[str]) -> DriftResult:
    """Normalize names, then reconcile against the expected list."""
    df = normalize_column_names(df)
    actual = df.columns
    added = [c for c in actual if c not in expected_columns]
    missing = [c for c in expected_columns if c not in actual]
    final_order = list(expected_columns) + added  # append drift at the end, as the
    # reference's update_item list_append does (ingestion.py:44-57)
    out = df.select(
        *[
            F.col(c) if c in actual else F.lit(None).cast("string").alias(c)
            for c in final_order
        ]
    )
    return DriftResult(df=out, columns=final_order, added_to_config=added, filled_null=missing)


# numeric widening lattice: a column may only promote upward
_WIDENING: dict[str, list[str]] = {
    "byte": ["short", "integer", "long", "double"],
    "short": ["integer", "long", "double"],
    "integer": ["long", "double"],
    "long": ["double"],
    "float": ["double"],
}


def widen_types(df: DataFrame, target_schema: dict[str, str]) -> DataFrame:
    """Additive type evolution: cast columns UP the numeric lattice
    (int→long→double, float→double) toward ``target_schema``
    ({col: spark type name}); narrowing or incompatible changes
    raise. This is the cast half of Delta's mergeSchema type
    evolution, usable on plain parquet."""
    casts = []
    for f in df.schema.fields:
        want = target_schema.get(f.name)
        have = f.dataType.simpleString()
        # normalize simpleString names (int → integer)
        have = {"int": "integer"}.get(have, have)
        if want is None or want == have:
            casts.append(F.col(f.name))
            continue
        want_n = {"int": "integer"}.get(want, want)
        if want_n in _WIDENING.get(have, []):
            casts.append(F.col(f.name).cast(want_n).alias(f.name))
        else:
            raise ValueError(
                f"refusing non-widening cast {f.name}: {have} -> {want_n}"
            )
    return df.select(*casts)
