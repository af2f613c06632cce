"""Decomposed-datetime helpers (SURVEY.md §1.2, P3).

GAM datetimes arrive as nested structs and the reference flattens
them to 7 columns — *_date_day/_date_month/_date_year/_hour/_minute/
_second/_timezoneid (/root/reference/loading.py:65-71,473-493;
produced at transformation.py:264-274). These helpers decompose a
TimestampType column into that layout and reconstruct it with
make_timestamp — both pure built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PART_SUFFIXES = (
    "_date_day",
    "_date_month",
    "_date_year",
    "_hour",
    "_minute",
    "_second",
    "_timezoneid",
)


def decompose_ts(df: DataFrame, ts_col: str, prefix: str | None = None, tz: str = "UTC") -> DataFrame:
    """Add the 7 decomposed columns for ``ts_col``."""
    p = prefix or ts_col
    c = F.col(ts_col)
    return df.select(
        "*",
        F.dayofmonth(c).alias(f"{p}_date_day"),
        F.month(c).alias(f"{p}_date_month"),
        F.year(c).alias(f"{p}_date_year"),
        F.hour(c).alias(f"{p}_hour"),
        F.minute(c).alias(f"{p}_minute"),
        F.second(c).alias(f"{p}_second"),
        F.lit(tz).alias(f"{p}_timezoneid"),
    )


def recompose_ts(prefix: str) -> Column:
    """Rebuild a timestamp from the decomposed columns
    (make_timestamp; timezone column intentionally ignored — the
    lake is pinned to UTC, SURVEY.md §1.2)."""
    return F.make_timestamp(
        F.col(f"{prefix}_date_year"),
        F.col(f"{prefix}_date_month"),
        F.col(f"{prefix}_date_day"),
        F.col(f"{prefix}_hour"),
        F.col(f"{prefix}_minute"),
        F.col(f"{prefix}_second"),
    )
