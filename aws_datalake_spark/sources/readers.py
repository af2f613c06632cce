"""Readers (SURVEY.md S4-S9, S15).

Thin, explicit wrappers over ``spark.read`` that pin the reference's
exact parse semantics. All distributed scans — filter pushdown and
column pruning reach the format runtime automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_report_csv(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """S4 — gzip CSV report, malformed rows dropped
    (ingestion.py:82: pd.read_csv(compression='gzip',
    error_bad_lines=False); gzip is auto-detected by extension)."""
    r = spark.read.option("header", True).option("mode", "DROPMALFORMED")
    r = r.schema(schema) if schema is not None else r.option("inferSchema", True)
    return r.csv(path)


def read_json_docs(spark: SparkSession, path: str, schema: StructType | str | None = None,
                   multi_line: bool = True) -> DataFrame:
    """S5 — JSON documents; multiLine=True because the reference
    writes pretty-printed arrays (ingestion.py:274-275 indent=4)."""
    r = spark.read.option("multiLine", multi_line)
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def read_csv_inferred(spark: SparkSession, path: str) -> DataFrame:
    """S6 — header + inferSchema CSV (great_expectations.py:60-63)."""
    return spark.read.option("header", True).option("inferSchema", True).csv(path)


def read_tsv(spark: SparkSession, path: str) -> DataFrame:
    """S7 — tab-delimited (Great Expectation PoC.py:13-14)."""
    return (
        spark.read.option("header", True)
        .option("delimiter", "\t")
        .option("inferSchema", True)
        .csv(path)
    )


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """S9 — text-file read (createKey.py:62-69)."""
    return spark.read.format("text").load(path)


def read_pipe_staging(spark: SparkSession, path: str, schema: StructType | str | None = None) -> DataFrame:
    """S15 — the warehouse COPY parse contract (loading.py:26-30):
    pipe delimiter, double-quote quoting, header skipped,
    'YYYY-MM-DD HH:MI:SS' timestamps."""
    r = (
        spark.read.option("sep", "|")
        .option("header", True)
        .option("quote", '"')
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
        .option("timestampNTZFormat", "yyyy-MM-dd HH:mm:ss")
    )
    r = r.schema(schema) if schema is not None else r.option("inferSchema", True)
    return r.csv(path)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """S8 — catalog table read (Great Expectation PoC.py:12)."""
    return spark.table(name)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — vectorized, with filter pushdown and column
    pruning like the parquet path (twin of write_orc)."""
    return spark.read.orc(path)


def read_csv_permissive(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Production twin of read_report_csv's DROPMALFORMED
    (ingestion.py:82 drops bad report lines silently): PERMISSIVE
    parse that CAPTURES malformed lines in a ``_corrupt_record``
    column instead of losing them, so a DQ gate can quarantine and
    count them (operators/dq.py) rather than guess at loss."""
    full = schema.rstrip() + ", _corrupt_record string"
    return (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .schema(full)
        .csv(path)
    )


def read_xml(spark: SparkSession, path: str, row_tag: str = "row",
             schema: StructType | str | None = None) -> DataFrame:
    """XML document scan (Spark 4 built-in spark-xml): one DataFrame
    row per ``row_tag`` element. Widens the S4-S17 source surface to
    the remaining common interchange format; splittable per file,
    schema inference optional like the JSON path."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[tuple[str, int, int, str]],
) -> DataFrame:
    """Fixed-width (mainframe/EDI-style) file read: each field is a
    byte range in the line. ``colspecs`` is a list of
    ``(name, start, length, type)`` with 1-based ``start`` (COBOL
    copybook convention) and ``type`` a Spark cast target
    (``'int'``, ``'double'``, ``'string'``, ``'date'``...).

    The text scan distributes per line-split like any Spark text
    read; field extraction is pure ``substring`` + ``trim`` + cast
    column arithmetic (whole-stage codegen, no Python). Blank-padded
    numerics cast NULL on empty after trim — the usual fixed-width
    contract. Column pruning drops unused substrings at the
    optimizer level, so a 2-field projection of a 200-field copybook
    only pays for 2 substrings.
    """
    from pyspark.sql import functions as F

    lines = spark.read.format("text").load(path)
    cols = []
    for name, start, length, typ in colspecs:
        raw = F.trim(F.substring(F.col("value"), start, length))
        c = F.when(raw == "", None).otherwise(raw) if typ != "string" else raw
        cols.append(c.cast(typ).alias(name))
    return lines.select(*cols)
