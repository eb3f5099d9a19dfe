"""Diff two benchmark result files per query.

Accepts either bench.py's raw one-line JSON or the driver's BENCH_r{N}
wrapper ({"n", "rc", "cpus", "sf", "tail", "parsed": {...}}) — the real
numbers live under "parsed" in the wrapped form.

Usage: python tools/bench_diff.py OLD NEW [threshold_pct=20]
Exit code 1 if any shared query regressed beyond the threshold.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        doc = json.loads(f.read())
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    if "queries" not in doc:
        raise SystemExit(f"{path}: no 'queries' key (not a bench result?)")
    return doc


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 20.0
    regressed = []
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    for k in shared:
        a, b = old["queries"][k], new["queries"][k]
        pct = (b - a) / a * 100 if a else 0.0
        mark = ""
        if pct > thresh:
            mark = " <<< REGRESSED"
            regressed.append(k)
        elif pct < -thresh:
            mark = " (improved)"
        print(f"{k:26s} {a:8.3f} -> {b:8.3f}  {pct:+6.1f}%{mark}")
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    for k in only_new:
        print(f"{k:26s}      new -> {new['queries'][k]:8.3f}")
    sa = sum(old["queries"][k] for k in shared)
    sb = sum(new["queries"][k] for k in shared)
    print(f"\nshared-query total: {sa:.3f} -> {sb:.3f} ({(sb - sa) / sa * 100:+.1f}%)")
    if regressed:
        print(f"regressed beyond {thresh:.0f}%: {', '.join(regressed)}")
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
