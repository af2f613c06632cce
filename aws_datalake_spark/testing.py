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
        res = con.execute(oracle)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    except Exception as e:  # noqa: BLE001
        return CheckResult(name, "FAIL", errors=[f"oracle error: {e}"])
    sc, sr = rows_sorted(scols, srows)
    oc, orr = rows_sorted(ocols, orows)
    errs: list[str] = []
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
