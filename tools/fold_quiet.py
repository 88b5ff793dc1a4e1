#!/usr/bin/env python3
"""Fold one or more full-catalog bench sweeps into bench_quiet.json
(per-query minima — the quiet-host reference Bench's outlier-retry
trigger compares against).

Guards (the round-10 lesson: one broken sweep poisoned 37 entries with
4-9 ms "timings" because the fold blindly took minima):
  * any sweep with a nonempty "failed" array is rejected outright;
  * any per-query value below FLOOR (50 ms — physically impossible for
    a Spark job on this host) is rejected outright;
  * all sweeps must cover the identical query set (a partial sweep must
    not silently shrink the reference catalog).

Usage: fold_quiet.py <out.json> <sweep1.json> [<sweep2.json> ...]
Each sweep file holds the FULL JSON line Bench prints (the one with the
per-query "queries" map).
"""
import json
import sys

FLOOR = 0.05

out_path, sweep_paths = sys.argv[1], sys.argv[2:]
assert sweep_paths, "need at least one sweep file"

sweeps = []
for p in sweep_paths:
    with open(p) as f:
        s = json.load(f)
    if s.get("failed"):
        sys.exit(f"REJECT {p}: sweep has failed queries {s['failed']} — "
                 "a broken sweep must not enter the quiet reference")
    if s.get("subset"):
        sys.exit(f"REJECT {p}: subset sweep — the quiet reference is full-catalog only")
    bad = {k: v for k, v in s["queries"].items() if v < FLOOR}
    if bad:
        sys.exit(f"REJECT {p}: sub-floor timings {bad} — "
                 "impossible values mean the sweep broke without throwing")
    sweeps.append((p, s["queries"]))

names = set(sweeps[0][1])
for p, q in sweeps[1:]:
    if set(q) != names:
        only_a = sorted(names - set(q))[:5]
        only_b = sorted(set(q) - names)[:5]
        sys.exit(f"REJECT {p}: query set differs from {sweep_paths[0]} "
                 f"(missing {only_a}, extra {only_b})")

minima = {n: min(q[n] for _, q in sweeps) for n in sorted(names)}
with open(out_path, "w") as f:
    f.write("{\n")
    f.write(",\n".join(f'"{k}": {v}' for k, v in sorted(minima.items())))
    f.write("\n}\n")
total = sum(minima.values())
print(f"wrote {out_path}: {len(minima)} queries, min-total {total:.1f}s "
      f"({total / len(minima):.2f} s/query) from {len(sweeps)} sweeps")
