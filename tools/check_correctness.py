"""Local stand-in for the driver's t2 correctness gate.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_spark.session import get_spark  # noqa: E402
from aws_datalake_spark.testing import run_all  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    spark = get_spark("check-correctness")
    t0 = time.time()
    results = run_all(spark, sf_dir, only)
    n = {"PASS": 0, "FAIL": 0, "ROWS": 0}
    for r in results:
        n[r.status] += 1
        detail = "; ".join(r.errors[:4]) if r.errors else f"{r.n_rows} rows"
        print(f"{r.status:5s} {r.name}: {detail}")
    print(f"\n{n['PASS']} pass, {n['FAIL']} fail, {n['ROWS']} rows-only [{time.time()-t0:.0f}s]")
    return 1 if n["FAIL"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
