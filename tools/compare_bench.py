#!/usr/bin/env python3
"""Bench regression guard (round-12, verdict item 5).

Compares a fresh full-catalog sweep against the committed references so
round certification is a tool run, not a manual diff:

  * vs bench_quiet.json (per-query minima at sf0.1): a query REGRESSES
    if new > max(2x * ref, ref + 1.0 s). The 2x-or-+1s envelope absorbs
    host noise on sub-second queries while catching real plan
    regressions on the expensive ones.
  * vs bench_8x.json (one clean sweep at the 8x replica corpus), via
    --eightx-sweep: same rule with a +2.0 s absolute allowance (longer
    runtimes, noisier), plus a report of the worst 8x/1x scale-ratio
    drifts against the reference's ratios.

Sweep hygiene (same guards as fold_quiet.py): a sweep with failed
queries, a subset marker, or sub-floor (< 50 ms) timings is rejected
outright — broken evidence must not certify anything.

Catalog drift (queries added to / removed from the reference) is
REPORTED but not a failure: new rounds add queries. Regressions exit
nonzero.

Usage:
  compare_bench.py <sweep.json> [--quiet bench_quiet.json]
                   [--eightx-sweep <sweep8x.json>] [--eightx bench_8x.json]
"""
import argparse
import json
import sys

FLOOR = 0.05


def load_sweep(path):
    with open(path) as f:
        s = json.load(f)
    if s.get("failed"):
        sys.exit(f"REJECT {path}: sweep has failed queries {s['failed']}")
    if s.get("subset"):
        sys.exit(f"REJECT {path}: subset sweep cannot certify the catalog")
    q = s["queries"] if "queries" in s else s
    bad = {k: v for k, v in q.items() if v < FLOOR}
    if bad:
        sys.exit(f"REJECT {path}: sub-floor timings {bad}")
    return q


def compare(name, new, ref, abs_allow):
    common = sorted(set(new) & set(ref))
    added = sorted(set(new) - set(ref))
    removed = sorted(set(ref) - set(new))
    flags = []
    for k in common:
        limit = max(2 * ref[k], ref[k] + abs_allow)
        if new[k] > limit:
            flags.append((k, ref[k], new[k], limit))
    print(f"[{name}] {len(common)} common queries "
          f"(+{len(added)} new, -{len(removed)} removed from reference)")
    if added:
        print(f"[{name}]   new: {', '.join(added[:10])}{' ...' if len(added) > 10 else ''}")
    if removed:
        print(f"[{name}]   removed: {', '.join(removed[:10])}{' ...' if len(removed) > 10 else ''}")
    tot_new = sum(new[k] for k in common)
    tot_ref = sum(ref[k] for k in common)
    print(f"[{name}] common-query total: {tot_new:.1f}s vs reference {tot_ref:.1f}s "
          f"({tot_new / tot_ref:.2f}x)")
    for k, r, n, lim in sorted(flags, key=lambda t: t[2] - t[3], reverse=True):
        print(f"[{name}] REGRESSION {k}: {n:.2f}s vs reference {r:.2f}s "
              f"(limit {lim:.2f}s)")
    if not flags:
        print(f"[{name}] zero regressions above max(2x, +{abs_allow:.0f}s)")
    return flags, dict((k, new[k]) for k in common), dict((k, ref[k]) for k in common)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sweep")
    ap.add_argument("--quiet", default="bench_quiet.json")
    ap.add_argument("--eightx-sweep")
    ap.add_argument("--eightx", default="bench_8x.json")
    args = ap.parse_args()

    new = load_sweep(args.sweep)
    with open(args.quiet) as f:
        ref = json.load(f)
    flags, _, _ = compare("quiet", new, ref, abs_allow=1.0)

    all_flags = list(flags)
    if args.eightx_sweep:
        new8 = load_sweep(args.eightx_sweep)
        ref8 = load_sweep(args.eightx)
        flags8, c_new8, c_ref8 = compare("8x", new8, ref8, abs_allow=2.0)
        all_flags += flags8
        # scale-ratio drift: (new 8x / quiet 1x) vs (ref 8x / quiet 1x)
        drifts = []
        for k in set(c_new8) & set(ref) & set(new):
            if ref[k] >= FLOOR and new[k] >= FLOOR:
                r_ref = c_ref8[k] / ref[k]
                r_new = c_new8[k] / new[k]
                if r_ref > 0:
                    drifts.append((k, r_ref, r_new, r_new / r_ref))
        drifts.sort(key=lambda t: t[3], reverse=True)
        print("[8x] worst scale-ratio drifts (new 8x/1x vs reference 8x/1x):")
        for k, r_ref, r_new, d in drifts[:8]:
            print(f"[8x]   {k}: ratio {r_new:.1f}x vs ref {r_ref:.1f}x (drift {d:.2f}x)")

    if all_flags:
        sys.exit(f"{len(all_flags)} bench regression(s) flagged")
    print("bench guard: PASS")


if __name__ == "__main__":
    main()
