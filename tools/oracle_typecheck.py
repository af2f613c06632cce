"""Scan every registered DuckDB oracle for hash-hostile result types.

The driver's value hash is type-sensitive: DuckDB `SUM(<integer>)`
returns HUGEINT (int128) while Spark's `sum(<integer>)` returns
BIGINT, so a value-identical result still hash-mismatches (round-2
verdict root cause, 13 red rows). This tool executes each oracle at a
small sf and reports any column whose Arrow type is int128/decimal —
those oracles need an explicit `CAST(... AS BIGINT)` / `AS DOUBLE`.

Usage: python tools/oracle_typecheck.py [sf_dir]
Exit 1 if any offending oracle is found.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_spark.testing import duckdb_con, hostile_oracle_types  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from aws_datalake_spark.queries import all_oracles

    con = duckdb_con(sf_dir)
    bad = 0
    for name, sql in sorted(all_oracles().items()):
        try:
            offending = hostile_oracle_types(con, sql)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            bad += 1
            continue
        if offending:
            bad += 1
            cols = ", ".join(f"{c}:{t}" for c, t in offending)
            print(f"HOSTILE {name}: {cols}")
    print(f"\n{bad} oracle(s) with hash-hostile types")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
