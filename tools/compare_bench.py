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
  * vs bench_32x.json (the 32x replica corpus), via --thirtytwox-sweep:
    same rule with a +4.0 s allowance. The 32x leg is SUBSET-aware on
    both sides (the reference excludes the pair-family operators whose
    true output grows ~1024x on the replica corpus; SCALING.md) —
    comparison runs on the intersection and prints what was skipped,
    plus the worst 32x/1x ratio drifts. Round-12's two scale cliffs
    (q124 1320.9 s, q98 556 s) were invisible at 8x; this leg is the
    per-round guard that they stay fixed (round-13, verdict item 3).

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


def load_sweep(path, allow_subset=False):
    with open(path) as f:
        s = json.load(f)
    if s.get("failed"):
        sys.exit(f"REJECT {path}: sweep has failed queries {s['failed']}")
    if s.get("subset") and not allow_subset:
        sys.exit(f"REJECT {path}: subset sweep cannot certify the catalog")
    q = s["queries"] if "queries" in s else s
    bad = {k: v for k, v in q.items() if v < FLOOR}
    if bad:
        sys.exit(f"REJECT {path}: sub-floor timings {bad}")
    return q


def ratio_drift(tag, new_big, ref_big, quiet_ref, quiet_new):
    """Worst (new big/1x) vs (reference big/1x) scale-ratio drifts."""
    drifts = []
    for k in set(new_big) & set(ref_big) & set(quiet_ref) & set(quiet_new):
        if quiet_ref[k] >= FLOOR and quiet_new[k] >= FLOOR:
            r_ref = ref_big[k] / quiet_ref[k]
            r_new = new_big[k] / quiet_new[k]
            if r_ref > 0:
                drifts.append((k, r_ref, r_new, r_new / r_ref))
    drifts.sort(key=lambda t: t[3], reverse=True)
    print(f"[{tag}] worst scale-ratio drifts (new {tag}/1x vs reference {tag}/1x):")
    for k, r_ref, r_new, d in drifts[:8]:
        print(f"[{tag}]   {k}: ratio {r_new:.1f}x vs ref {r_ref:.1f}x (drift {d:.2f}x)")


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
    ap.add_argument("--thirtytwox-sweep")
    ap.add_argument("--thirtytwox", default="bench_32x.json")
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
        ratio_drift("8x", c_new8, c_ref8, ref, new)

    if args.thirtytwox_sweep:
        new32 = load_sweep(args.thirtytwox_sweep, allow_subset=True)
        ref32 = load_sweep(args.thirtytwox, allow_subset=True)
        flags32, c_new32, c_ref32 = compare("32x", new32, ref32, abs_allow=4.0)
        all_flags += flags32
        # Both sides are subset-allowed, so intersection-only comparison
        # could go vacuously green if a GUARDED query (q98/q124 — the
        # scale cliffs this leg exists to pin) were simply absent from
        # the new sweep (ADVICE r13). The new 32x sweep must be a
        # superset of the committed reference's query set; a shrink is a
        # failure, not a note.
        missing32 = sorted(set(ref32) - set(new32))
        if missing32:
            print(f"[32x] MISSING from new sweep (guard would be vacuous): "
                  f"{', '.join(missing32)}")
            all_flags += [(k, ref32[k], float("nan"), float("nan")) for k in missing32]
        ratio_drift("32x", c_new32, c_ref32, ref, new)

    if all_flags:
        sys.exit(f"{len(all_flags)} bench regression(s) flagged")
    print("bench guard: PASS")


if __name__ == "__main__":
    main()
