"""Probe scaling for a query list and MERGE rows into scaling.json
(never dropping existing rows — unlike scaling_curve.py, which
rewrites the file for its full query list).

Default points are sf1/sf3 (VERDICT r07 item 1: the past-sf1 probe,
exponent_1_3 = log10(t3/t1)/log10(3)); pass ``--points 0.01 0.1 1``
for the standard at-birth 3-point curve (exponent = log10(t1/t0.1)).

Usage: python tools/sf3_probe.py [--runs 3] [--points ...]
                                 [--queries q1 q2 ...]
Requires testdata_sf3 (tools/gen_sf.py --sf 3 --out testdata_sf3).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# the round-7 iterative-graph cost class (VERDICT r07 item 1)
DEFAULT_QUERIES = [
    "q_graph_hits",
    "q_graph_ppr",
    "q_graph_ktruss",
    "q_graph_kcore",
    "q_graph_communities",
    "q_clustering_coefficient",
    "llm_cluster_db_index",
]

SF_DIRS = {
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
    "1": os.path.join(REPO, "testdata_sf1"),
    "3": os.path.join(REPO, "testdata_sf3"),
}


def _time_query(spark, fn, sf_dir: str, runs: int) -> float:
    times = []
    for i in range(runs + 1):  # first run = warm-up, discarded
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.monotonic() - t0
        if i > 0:
            times.append(dt)
    return statistics.median(times)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--points", nargs="*", default=["1", "3"],
                    choices=sorted(SF_DIRS))
    ap.add_argument("--queries", nargs="*", default=DEFAULT_QUERIES)
    ap.add_argument("--out", default=os.path.join(REPO, "scaling.json"))
    args = ap.parse_args()

    from aws_datalake_spark.queries import all_queries
    from aws_datalake_spark.session import get_spark

    sfs = [(p, SF_DIRS[p]) for p in args.points]
    for _, d in sfs:
        if not os.path.isdir(d):
            raise SystemExit(f"fixture missing: {d} (run tools/gen_sf.py)")

    spark = get_spark()
    reg = all_queries()
    with open(args.out) as f:
        blob = json.load(f)
    results = blob["results"]

    hdr = " | ".join(f"sf{p} s" for p in args.points)
    print(f"| query | {hdr} | exponent |")
    print("|---|" + "---|" * (len(sfs) + 1))
    for name in args.queries:
        row = results.setdefault(name, {})
        t = {}
        for sf, d in sfs:
            t[sf] = round(_time_query(spark, reg[name], d, args.runs), 3)
            row[sf] = t[sf]
        # exponent over the last decade step: per 10× rows between the
        # two largest points (log10 of the time ratio over log10 of
        # the sf ratio)
        hi, lo = args.points[-1], args.points[-2]
        exp_key = (
            "exponent_1_3" if (lo, hi) == ("1", "3") else "exponent"
        )
        row[exp_key] = round(
            math.log10(max(t[hi], 1e-3) / max(t[lo], 1e-3))
            / math.log10(float(hi) / float(lo)),
            2,
        )
        cells = " | ".join(str(t[p]) for p in args.points)
        print(f"| {name} | {cells} | {row[exp_key]} |", flush=True)
        with open(args.out, "w") as f:  # incremental: survive a kill
            json.dump(blob, f, indent=1)


if __name__ == "__main__":
    main()
