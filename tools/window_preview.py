"""Preview the driver's next 50-query correctness window.

The external driver hash-checks the FIRST 50 entries of
``__spark_entry__.queries()`` each round; this tool prints exactly
that window (plus the backlog that will wait), with each query's
oracle status and cumulative driver-green history — so the rotation
logic in ``queries/__init__.py`` is auditable without running Spark.

Usage: python tools/window_preview.py [window_size]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_datalake_spark.queries import (  # noqa: E402
    all_oracles,
    driver_ordered_queries,
)
from aws_datalake_spark.queries import _driver_green_names  # noqa: E402


def main() -> None:
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    names = list(driver_ordered_queries())
    oracles = set(all_oracles())
    green = _driver_green_names()
    print(f"registry: {len(names)} queries; driver-green so far: "
          f"{len(green & set(names))}; window size: {size}\n")
    print("=== next window ===")
    for i, n in enumerate(names[:size]):
        tag = "rows-only" if n not in oracles else "oracle"
        g = "GREEN" if n in green else "new  "
        print(f"{i:3d}  {g}  {tag:9s}  {n}")
    backlog = [n for n in names[size:] if n not in green]
    print(f"\n=== backlog after this window: {len(backlog)} never-green ===")
    for n in backlog:
        tag = "rows-only" if n not in oracles else "oracle"
        print(f"     {tag:9s}  {n}")


if __name__ == "__main__":
    main()
