"""Diff two benchmark result files per query.

Accepts either bench.py's raw one-line JSON or the driver's BENCH_r{N}
wrapper ({"n", "rc", "cpus", "sf", "tail", "parsed": {...}}) — the real
numbers live under "parsed" in the wrapped form.

Usage: python tools/bench_diff.py [--cpu] [--force] OLD NEW [threshold_pct=20]
Exit code 1 if any shared query regressed beyond the threshold.

--cpu diffs the per-query executor-CPU medians instead of wall. cpu is
only cross-round evidence between QUIET runs (r11 judge finding: a
flagged-noisy run's cpu medians sat 1.2-5x above the same-code quiet
record — co-tenancy inflates real CPU burn, not just wall), so a cpu
diff involving a run with "cpu_reliable": false (or legacy artifacts
with "noisy": true) is REFUSED with exit code 2 unless --force is
given, and --force still prints the contamination warning. Wall diffs
involving a noisy run print a loud caveat but proceed — wall noise is
what the per-query medians and the threshold already absorb.
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


def cpu_reliable(doc: dict) -> bool:
    """Whether this run's cpu medians are valid cross-round evidence.
    Artifacts since r12 say so directly ("cpu_reliable"); legacy
    artifacts fall back to the noisy flag (absent flag = pre-canary
    artifact, treated as reliable — those rounds had no better)."""
    if "cpu_reliable" in doc:
        return bool(doc["cpu_reliable"])
    return not doc.get("noisy", False)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    use_cpu = "--cpu" in flags
    if len(args) < 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    thresh = float(args[2]) if len(args) > 2 else 20.0
    key = "cpu" if use_cpu else "queries"
    if use_cpu:
        for path, doc in ((args[0], old), (args[1], new)):
            if not isinstance(doc.get("cpu"), dict):
                raise SystemExit(f"{path}: no per-query 'cpu' dict (unmetered run?)")
            if not cpu_reliable(doc):
                msg = (
                    f"{path}: cpu medians are NOT cross-round evidence — the run "
                    "is flagged noisy (r11: noisy-run cpu read 1.2-5x above the "
                    "same-code quiet record). Compare quiet runs, or --force to "
                    "proceed anyway."
                )
                if "--force" not in flags:
                    print(msg, file=sys.stderr)
                    return 2
                print(f"WARNING: {msg}", file=sys.stderr)
    else:
        for path, doc in ((args[0], old), (args[1], new)):
            if doc.get("noisy"):
                print(
                    f"CAVEAT: {path} is flagged noisy — wall deltas below may be "
                    "contention, not code (check steal_med_share/canary_ratio).",
                    file=sys.stderr,
                )
    regressed = []
    shared = sorted(set(old[key]) & set(new[key]))
    for k in shared:
        a, b = old[key][k], new[key][k]
        pct = (b - a) / a * 100 if a else 0.0
        mark = ""
        if pct > thresh:
            mark = " <<< REGRESSED"
            regressed.append(k)
        elif pct < -thresh:
            mark = " (improved)"
        print(f"{k:26s} {a:8.3f} -> {b:8.3f}  {pct:+6.1f}%{mark}")
    only_new = sorted(set(new[key]) - set(old[key]))
    for k in only_new:
        print(f"{k:26s}      new -> {new[key][k]:8.3f}")
    sa = sum(old[key][k] for k in shared)
    sb = sum(new[key][k] for k in shared)
    unit = "cpu" if use_cpu else "wall"
    print(f"\nshared-query {unit} total: {sa:.3f} -> {sb:.3f} ({(sb - sa) / sa * 100:+.1f}%)")
    if regressed:
        print(f"regressed beyond {thresh:.0f}%: {', '.join(regressed)}")
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
