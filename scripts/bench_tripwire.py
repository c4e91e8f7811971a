#!/usr/bin/env python3
"""Wall-time regression tripwire (VERDICT r7 item 2).

Compares a fresh per-query bench detail against the previous round's
BENCH_DETAIL.json and exits non-zero if any query regressed past the
tripwire: new > 10 s absolute, or new > 3x its prior time (the 3x leg
only applies when new >= 1.0 s -- sub-second queries jitter well past 3x
run to run and a 0.05 s -> 0.2 s move is not the failure class this
guards against; graph_hits shipped at 30 s through a green gate because
nothing looked at wall time at all).

Usage: bench_tripwire.py <prior_detail.json> <fresh_detail.json>
Missing prior file => informational pass (first run has no baseline).
"""
import json
import sys

ABS_CEILING = 10.0
RATIO = 3.0
RATIO_FLOOR = 1.0

# Latency metrics are cadence floors (trigger interval, state commit), not
# throughput -- they are stable run-to-run, so they get a HARD tripwire:
# new > 3x prior, or past an absolute ceiling derived from the cadence
# analogue (microbatch runs against a 200 ms trigger; ~30-45 ms is the
# documented band, 100 ms means the off-trigger-path progress tracking
# broke). Throughput metrics swing ~4x with box state (BASELINE.md band
# notes; r11's 0.38x producer-ingest scare was noise) -- regressions there
# are judged ONLY by same-session worktree A/B, so they print as
# informational ratios and never trip.
LATENCY_CEILINGS_MS = {
    "microbatch_latency_ms": 100.0,
    "realtime_visible_ms": 200.0,
    "realtime_e2e_ms": 600.0,
}

prior_path, fresh_path = sys.argv[1], sys.argv[2]
try:
    prior_all = json.load(open(prior_path))
except (OSError, ValueError):
    print(f"tripwire: no prior detail at {prior_path} -- pass (no baseline)")
    sys.exit(0)
prior = prior_all.get("queries", {})
fresh_all = json.load(open(fresh_path))
fresh = fresh_all.get("queries", {})

trips = []
for name, ceil_ms in sorted(LATENCY_CEILINGS_MS.items()):
    ms = fresh_all.get(name)
    if ms is None:
        continue
    if ms > ceil_ms:
        trips.append(f"{name}: {ms:.1f}ms > {ceil_ms:.0f}ms absolute ceiling")
    elif name in prior_all and ms > RATIO * prior_all[name]:
        trips.append(
            f"{name}: {ms:.1f}ms > {RATIO:.0f}x prior {prior_all[name]:.1f}ms")
for name in sorted(k for k in fresh_all
                   if k.endswith("_rows_per_sec") or k.endswith("_mb_per_sec")):
    if name in prior_all and prior_all[name] > 0:
        r = fresh_all[name] / prior_all[name]
        if r < 0.5:
            print(f"info {name}: {r:.2f}x prior -- NOT a trip "
                  f"(throughput band; confirm via same-session A/B)")
for name, sec in sorted(fresh.items()):
    if sec > ABS_CEILING:
        trips.append(f"{name}: {sec:.2f}s > {ABS_CEILING:.0f}s absolute ceiling")
    elif name in prior and sec >= RATIO_FLOOR and sec > RATIO * prior[name]:
        trips.append(
            f"{name}: {sec:.2f}s > {RATIO:.0f}x prior {prior[name]:.2f}s")

if trips:
    for t in trips:
        print(f"TRIP {t}")
    print(f"tripwire: {len(trips)} wall-time regression(s)")
    sys.exit(1)
print(f"tripwire: {len(fresh)} queries within band "
      f"(<= {ABS_CEILING:.0f}s abs, <= {RATIO:.0f}x prior)")
