"""Cross-round bench comparison: read every BENCH_r*.json the driver
has recorded, align per-query medians, and print the queries whose
round-over-round delta exceeds the recorded noise floor — so a bench
regression in round N is attributable to a specific query, not a
vibe. Usage: python tools/bench_history.py [threshold_sec]

Same-session A/B mode (VERDICT r09 item 8): ``--ab q1 q2 ...``
measures the named queries NOW (5-run medians, one Spark session,
bench.py's materialize) and prints them beside the last two driver
tails — separating machine-level ambient drift from real movement
without relying on plan-identity alone: if the fresh same-session
median sits between the two driver readings, the tail-to-tail delta
was ambient. Usage:
    python tools/bench_history.py --ab q_bootstrap_ci q_ewma_smoothing
"""

from __future__ import annotations

import glob
import json
import os
import sys


def _load(path: str) -> dict | None:
    try:
        doc = json.load(open(path))
    except (OSError, ValueError):
        return None
    # driver artifacts wrap the bench line under "parsed"; tail-only
    # artifacts (parsed=None, front-truncated "tail" string) still
    # carry most per-query pairs — recover them by regex
    if "parsed" in doc:
        parsed = doc["parsed"]
        if not (isinstance(parsed, dict) and "queries" in parsed):
            import re

            tail = doc.get("tail") or ""
            pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9.]+)', tail)
            qs = {
                k: float(v)
                for k, v in pairs
                if k not in ("value", "sf", "spread_total", "runs")
            }
            if not qs:
                return None
            parsed = {"queries": qs, "value": None}
        doc = parsed
    return doc if isinstance(doc, dict) and "queries" in doc else None


def _ab(queries: list[str], runs: int = 5) -> int:
    import statistics
    import time

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    from aws_datalake_spark.queries import all_queries
    from aws_datalake_spark.session import get_spark
    from bench import materialize

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    rounds = []
    for p in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        doc = _load(p)
        if doc:
            rounds.append((os.path.basename(p), doc))
    tails = rounds[-2:]
    spark = get_spark()
    reg = all_queries()
    hdr = " | ".join(n for n, _ in tails)
    print(f"| query | {hdr} | now (same-session median of {runs}) |")
    print("|---|" + "---|" * (len(tails) + 1))
    for name in queries:
        times = []
        for i in range(runs + 1):  # first run warms, discarded
            t0 = time.monotonic()
            materialize(reg[name](spark, sf_dir))
            dt = time.monotonic() - t0
            if i > 0:
                times.append(dt)
        med = round(statistics.median(times), 3)
        cells = " | ".join(
            str(doc["queries"].get(name, "-")) for _, doc in tails
        )
        print(f"| {name} | {cells} | {med} |", flush=True)
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--ab":
        return _ab(sys.argv[2:])
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 0.5
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds: list[tuple[str, dict]] = []
    for p in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        doc = _load(p)
        if doc:
            rounds.append((os.path.basename(p), doc))
    if len(rounds) < 2:
        print(f"{len(rounds)} bench round(s) found — nothing to compare")
        return 0
    (pn, prev), (cn, cur) = rounds[-2], rounds[-1]
    print(f"{pn}: total {prev.get('value')}s ({len(prev['queries'])} queries)")
    print(f"{cn}: total {cur.get('value')}s ({len(cur['queries'])} queries)")
    spread = cur.get("spread_total")
    if spread is not None:
        print(f"recorded noise floor (spread_total): {spread}s")
    common = sorted(set(prev["queries"]) & set(cur["queries"]))
    deltas = sorted(
        ((q, cur["queries"][q] - prev["queries"][q]) for q in common),
        key=lambda kv: -abs(kv[1]),
    )
    flagged = [(q, d) for q, d in deltas if abs(d) >= threshold]
    print(f"\n{len(common)} common queries; |delta| >= {threshold}s:")
    for q, d in flagged or deltas[:5]:
        print(f"  {q}: {d:+.2f}s ({prev['queries'][q]} -> {cur['queries'][q]})")
    new = sorted(set(cur["queries"]) - set(prev["queries"]))
    if new:
        added = sum(cur["queries"][q] for q in new)
        print(f"\n{len(new)} new queries contribute {added:.1f}s of the total")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
