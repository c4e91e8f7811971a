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

prior_path, fresh_path = sys.argv[1], sys.argv[2]
try:
    prior = json.load(open(prior_path)).get("queries", {})
except (OSError, ValueError):
    print(f"tripwire: no prior detail at {prior_path} -- pass (no baseline)")
    sys.exit(0)
fresh = json.load(open(fresh_path)).get("queries", {})

trips = []
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
