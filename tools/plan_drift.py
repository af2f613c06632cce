"""Attribute a bench drift between two commits to plan changes vs
ambient variance (the PERF §17/§22 method, mechanized).

For every query present in both commits' BENCH_local.json, diff the
two committed PLANS.md sections after normalizing away run-varying
noise (expression IDs, plan_ids, RDD numbers, scratch paths, lambda
variable counters). A query whose normalized plan is byte-identical
cannot have regressed by plan shape — its delta is machine-level
drift. The rest are REAL plan changes to adjudicate one by one.

Usage: python tools/plan_drift.py <rev_a> <rev_b> [top_n]
"""

from __future__ import annotations

import json
import re
import subprocess
import sys


def _sections(rev: str) -> dict[str, str]:
    txt = subprocess.check_output(["git", "show", f"{rev}:PLANS.md"]).decode()
    secs: dict[str, list[str]] = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"^## (\S+)", line)
        if m:
            cur = m.group(1)
            secs[cur] = []
        elif cur is not None:
            secs[cur].append(line)
    return {k: "\n".join(v) for k, v in secs.items()}


def _norm(s: str) -> str:
    s = re.sub(r"#\d+", "#N", s)
    s = re.sub(r"plan_id=\d+", "plan_id=N", s)
    s = re.sub(r"MapPartitionsRDD\[\d+\]", "MapPartitionsRDD[N]", s)
    s = re.sub(r"file:/\S+", "file:/X", s)
    s = re.sub(r"\b([a-z]+)_\d+", r"\1_N", s)  # lambda vars: x_12, y_34
    # run-varying scratch file names (txn-table data files carry UUIDs)
    s = re.sub(r"data/[0-9a-f]{32}/[\w.-]+\.parquet", "data/U/F.parquet", s)
    # the file's LAST section absorbs EOF blank lines — not a plan diff
    return s.rstrip("\n")


def _bench(rev: str) -> dict[str, float]:
    raw = subprocess.check_output(["git", "show", f"{rev}:BENCH_local.json"])
    return json.loads(raw)["queries"]


def main() -> None:
    rev_a, rev_b = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    pa, pb = _sections(rev_a), _sections(rev_b)
    ba, bb = _bench(rev_a), _bench(rev_b)
    common = sorted(set(ba) & set(bb))
    ident: list[str] = []
    struct: list[str] = []
    missing: list[str] = []
    for q in common:
        if q not in pa or q not in pb:
            missing.append(q)
        elif _norm(pa[q]) == _norm(pb[q]):
            ident.append(q)
        else:
            struct.append(q)

    def tot(names: list[str]) -> float:
        return sum(bb[q] - ba[q] for q in names)

    print(f"common queries: {len(common)}  "
          f"total {sum(ba[q] for q in common):.1f}s -> "
          f"{sum(bb[q] for q in common):.1f}s "
          f"({tot(common):+.1f}s)")
    print(f"  identical plans: {len(ident)} queries, {tot(ident):+.1f}s "
          f"(ambient drift by construction)")
    print(f"  structural diffs: {len(struct)} queries, {tot(struct):+.1f}s "
          f"(real plan changes - adjudicate below)")
    if missing:
        print(f"  no PLANS section: {len(missing)} ({missing})")
    print("\n| query | class | t_a s | t_b s | delta |")
    print("|---|---|---|---|---|")
    movers = sorted(common, key=lambda q: -abs(bb[q] - ba[q]))[:top_n]
    for q in movers:
        k = ("identical" if q in ident
             else "STRUCTURAL" if q in struct else "no-section")
        print(f"| {q} | {k} | {ba[q]:.2f} | {bb[q]:.2f} "
              f"| {bb[q] - ba[q]:+.2f} |")
    print("\nstructural-diff queries:")
    for q in sorted(struct, key=lambda q: -abs(bb[q] - ba[q])):
        print(f"  {q:34s} {ba[q]:6.2f} -> {bb[q]:6.2f}  "
              f"({bb[q] - ba[q]:+.2f})")


if __name__ == "__main__":
    main()
