"""Scalar / column-hygiene operators (SURVEY.md §2.2).

All pure built-in-function projections — they stay inside whole-stage
codegen and add no shuffle. Reference citations per function.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType


def replace_null_sentinel(df: DataFrame, sentinel: str = "-", cols: list[str] | None = None) -> DataFrame:
    """P8 — sentinel string → NULL (ingestion.py:83: df.replace('-', np.nan))."""
    target = cols or [f.name for f in df.schema.fields if f.dataType.typeName() == "string"]
    return df.na.replace(sentinel, None, subset=target)


def fill_metrics(df: DataFrame, value: float = 0.0, cols: list[str] | None = None) -> DataFrame:
    """P9 — NaN/NULL → fill value on numeric cols (transformation.py:73)."""
    return df.na.fill(value, subset=cols)


def floats_to_int(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """P10 — float columns → long after 0-fill (ingestion.py:38-43:
    fillna(0).astype(int) over every float64 column)."""
    if cols is None:
        cols = [f.name for f in df.schema.fields if isinstance(f.dataType, (DoubleType, FloatType))]
    out = df.na.fill(0.0, subset=cols)
    return out.select(
        *[F.col(c).cast("long").alias(c) if c in cols else F.col(c) for c in out.columns]
    )


def coalesce_zero_long(col: Column | str) -> Column:
    """P11 — NULL→0 int coercion of one metric
    (transformation.py:127-143: int(0 if x is None else x))."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(0)).cast("long")


def add_generic_padding(df: DataFrame, n: int = 10, start: int = 1) -> DataFrame:
    """P12 — NULL padding columns generic<start>..generic<start+n-1>
    (ingestion.py:24-31)."""
    pads = [F.lit(None).cast("string").alias(f"generic{i}") for i in range(start, start + n)]
    return df.select("*", *pads)


def add_audit_ts(df: DataFrame, historical_date: str | None = None, col_name: str = "insrt_ts") -> DataFrame:
    """P13 — audit timestamp: now, or date+1s for historical loads
    (ingestion.py:28-36, transformation.py:59-67)."""
    if historical_date is not None:
        ts = F.to_timestamp(F.lit(historical_date)) + F.expr("interval 1 second")
    else:
        ts = F.date_trunc("second", F.current_timestamp())
    return df.withColumn(col_name, ts)


def normalize_name(name: str) -> str:
    """P14 — lowercase, spaces→underscore, strip prefix before the
    first dot ('Ad Unit.Name' → 'name'; ingestion.py:89-91)."""
    n = name.split(".")[-1]
    return re.sub(r"\s+", "_", n.strip()).lower()


def normalize_column_names(df: DataFrame) -> DataFrame:
    """P14 applied to every column."""
    return df.toDF(*[normalize_name(c) for c in df.columns])


def mask_columns(df: DataFrame, masking_cols: list[str]) -> DataFrame:
    """P17 — column masking by drop (partitioning.py:62-69); absent
    names are ignored, as dict.pop defaults do in the reference."""
    present = [c for c in masking_cols if c in df.columns]
    return df.drop(*present)


def with_literal(df: DataFrame, name: str, value) -> DataFrame:
    """P18 — constant column (transformation.py:360: targetting_type)."""
    return df.withColumn(name, F.lit(value))


def insert_column_at(df: DataFrame, position: int, name: str, col: Column | None = None) -> DataFrame:
    """P19 — positional column insert (transformation.py:408-409:
    df.insert(49, 'generic11', None))."""
    c = (col if col is not None else F.lit(None).cast("string")).alias(name)
    names = [F.col(x) for x in df.columns]
    return df.select(*names[:position], c, *names[position:])


def project_final(df: DataFrame, final_columns: list[str]) -> DataFrame:
    """P6 — projection to the config-declared final column list
    (transformation.py:395), materializing absent columns as NULL the
    way schema reconciliation does (ingestion.py:103-104)."""
    return df.select(
        *[
            F.col(c) if c in df.columns else F.lit(None).cast("string").alias(c)
            for c in final_columns
        ]
    )
