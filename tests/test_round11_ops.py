"""Round-11 pins: steal-invariant bench metering (hostmeter), the
in-run noise canaries, and the paired wall/cpu tail-cap trim.

Context (r10 verdict item 1): two consecutive official bench artifacts
were flagged-noisy and four same-code runs spanned 157-226 s — the
hypervisor steals CPU in patches invisible to in-guest loadavg, so
wall-clock alone can no longer prove or refute a cross-round perf
claim. The fix is instrumentation: per-query executor CPU time (steal
cannot inflate it) and the guest's paravirt steal counter itself.
"""

from __future__ import annotations

import importlib.util
import json
import time


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def test_hostmeter_counters_monotonic_and_busy_moves():
    """snapshot() returns cumulative counters that (a) exist on this
    host, (b) never decrease, and (c) busy/cpu advance when the guest
    burns CPU — the property every per-rep delta in bench.py rests on."""
    from emdrive_spark.functions import hostmeter

    a = hostmeter.snapshot()
    assert a["busy_s"] is not None and a["steal_s"] is not None
    assert a["cpu_s"] is not None
    # burn ~0.15 s of CPU in-process
    t0 = time.process_time()
    x = 0
    while time.process_time() - t0 < 0.15:
        x += 1
    b = hostmeter.snapshot()
    d = hostmeter.delta(a, b)
    assert d["busy_s"] >= 0 and d["steal_s"] >= 0 and d["cpu_s"] >= 0
    # jiffy resolution is 10 ms; 150 ms of burn must register on both
    # the /proc/stat busy counter and the cgroup ns counter
    assert d["busy_s"] >= 0.05, d
    assert d["cpu_s"] >= 0.05, d


def test_hostmeter_steal_share_algebra():
    from emdrive_spark.functions import hostmeter

    assert hostmeter.steal_share({"busy_s": 95.0, "steal_s": 5.0}) == 0.05
    assert hostmeter.steal_share({"busy_s": 0.0, "steal_s": 0.0}) is None
    assert hostmeter.steal_share({"busy_s": None, "steal_s": 5.0}) is None
    assert hostmeter.steal_share({"busy_s": 5.0, "steal_s": None}) is None
    d = hostmeter.delta(
        {"busy_s": 10.0, "steal_s": 1.0, "cpu_s": 12.0},
        {"busy_s": 16.0, "steal_s": 3.0, "cpu_s": 20.0},
    )
    assert d == {"busy_s": 6.0, "steal_s": 2.0, "cpu_s": 8.0}
    # None propagates per-field, never raises
    d = hostmeter.delta(
        {"busy_s": None, "steal_s": 1.0, "cpu_s": None},
        {"busy_s": 16.0, "steal_s": 3.0, "cpu_s": 20.0},
    )
    assert d["busy_s"] is None and d["steal_s"] == 2.0 and d["cpu_s"] is None


def test_bench_canary_ratio_contract():
    """canary_ratio: median this-run/committed ratio over the pinned
    set; None below 3 comparable canaries (first run, renames, zero or
    missing baselines) so a missing record can never flag a run."""
    bench = _load_bench()
    names = list(bench._CANARY)
    assert len(names) == 5
    timings = {n: 2.0 for n in names}
    base = {n: 1.0 for n in names}
    assert bench._canary_ratio(timings, base) == 2.0
    # mixed: 3 at 1.0x, 2 at 10x -> median 1.0 (a patch on a minority
    # of canaries does not flag the run; sustained inflation does)
    mixed = dict(base, **{names[0]: 0.2, names[1]: 0.2})
    assert bench._canary_ratio(timings, mixed) == 2.0
    assert bench._canary_ratio(timings, {}) is None
    assert bench._canary_ratio(timings, {names[0]: 1.0, names[1]: 1.0}) is None
    # zero/garbage baselines are excluded, not divided by
    bad = {n: 0.0 for n in names}
    assert bench._canary_ratio(timings, bad) is None


def test_bench_canary_names_are_headline_members():
    """Every canary must be a HEADLINE query (else its median never
    exists at canary time) and must carry a committed quiet-record row
    to compare against."""
    bench = _load_bench()
    for n in bench._CANARY:
        assert n in bench.HEADLINE, n
    rec = json.load(open("/root/repo/BENCH_LOCAL.json"))
    for n in bench._CANARY:
        assert isinstance(rec["queries"].get(n), (int, float)), n


def test_fit_tail_cap_trims_wall_and_cpu_in_tandem():
    """The stdout line now carries two per-query dicts; a trimmed row
    must leave BOTH (aligned dicts), the per-query steal dict never
    rides on stdout, and the full payload is never mutated."""
    bench = _load_bench()
    qs = {f"op_with_a_realistic_name_{i:03d}": round(0.2 + i * 0.13, 3) for i in range(90)}
    cpu = {k: round(v * 7.3, 3) for k, v in qs.items()}
    steal = {k: 0.01 for k in qs}
    payload = {
        "metric": "headline_queries_total",
        "value": 123.456,
        "unit": "sec",
        "queries": qs,
        "cpu": cpu,
        "steal": steal,
        "cpu_total": 900.1,
        "steal_total": 1.23,
        "steal_share": 0.004,
        "canary_ratio": 1.02,
        "reps": 5,
        "load_avg": [8.1, 8.39, 6.77],
        "load_at_start": 0.28,
        "noisy": False,
        "sf": 0.1,
    }
    slim = bench._fit_tail_cap(payload)
    line = json.dumps(slim, separators=(",", ":"))
    assert len(line) <= 2000 - 1
    assert "steal" not in slim and slim["steal_total"] == 1.23
    assert set(slim["cpu"]) == set(slim["queries"])
    assert slim["queries_elided"] == 90 - len(slim["queries"])
    kept_min = min(slim["queries"].values())
    elided_max = max(v for k, v in qs.items() if k not in slim["queries"])
    assert elided_max <= kept_min
    # scalar signal fields survive trimming
    parsed = json.loads(line)
    assert parsed["steal_share"] == 0.004 and parsed["canary_ratio"] == 1.02
    assert len(payload["queries"]) == 90 and len(payload["cpu"]) == 90
