"""Interleaved same-session A/B of the working tree vs a worktree.

Usage: python tools/ab_worktree.py /tmp/r11_before query [query ...]

One Spark session (one JVM); per query, runs alternate NEW, OLD, NEW,
OLD, ... (after one discarded warm-up of each side), so host-level
ambient drift — which swings identical plans 2x between sessions on
this box — hits both sides equally. Module trees are swapped by
purging `aws_datalake_spark` from sys.modules and re-importing with
the other root first on sys.path.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNS = 5  # timed runs per side


def _load(root: str):
    for m in [k for k in sys.modules if k.startswith("aws_datalake_spark")]:
        del sys.modules[m]
    sys.path.insert(0, root)
    try:
        from aws_datalake_spark.queries import all_queries

        return all_queries()
    finally:
        sys.path.remove(root)


def main() -> None:
    other = os.path.abspath(sys.argv[1])
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, REPO)
    from aws_datalake_spark.session import get_spark

    spark = get_spark("ab_worktree")
    sys.path.remove(REPO)

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    print(f"| query | old ({other}) | new (repo) | speedup |")
    print("|---|---|---|---|")
    for name in names:
        samples: dict[str, list[float]] = {"new": [], "old": []}
        fns = {}
        for side, root in (("new", REPO), ("old", other)):
            fns[side] = _load(root)[name]
            materialize(fns[side](spark, sf_dir))  # warm-up, discarded
        for _ in range(RUNS):
            for side, root in (("new", REPO), ("old", other)):
                _load(root)  # make imports inside the query fn see the right tree
                fn = _load(root)[name]
                t0 = time.monotonic()
                materialize(fn(spark, sf_dir))
                samples[side].append(time.monotonic() - t0)
        o = statistics.median(samples["old"])
        n = statistics.median(samples["new"])
        print(
            f"| {name} | {o:.3f} | {n:.3f} | {o / n:.2f}x |",
            flush=True,
        )


if __name__ == "__main__":
    main()
