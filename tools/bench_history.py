"""Cross-round bench comparison: read every BENCH_r*.json the driver
has recorded, align per-query medians, and print the queries whose
round-over-round delta exceeds the recorded noise floor — so a bench
regression in round N is attributable to a specific query, not a
vibe. Usage: python tools/bench_history.py [threshold_sec]
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
    # driver artifacts wrap the bench line under "parsed"
    if "parsed" in doc:
        doc = doc["parsed"]
    return doc if isinstance(doc, dict) and "queries" in doc else None


def main() -> int:
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
