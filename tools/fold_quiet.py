#!/usr/bin/env python3
"""Fold full-catalog bench sweeps into bench_quiet.json (per-query
minima — the quiet-host reference Bench's outlier-retry trigger and
compare_bench.py measure against).

MONOTONIC FOLD (round-13, verdict item 2): the round-12 reference was
re-folded from four load-contaminated sweeps and silently ratcheted 16%
ABOVE the round-11 minima, giving compare_bench.py that much slack.
The fold therefore also takes `--prior <committed bench_quiet.json>`
(repeatable): per-query minima are computed across the new sweeps AND
every prior reference, so a noisy re-fold can never raise an entry.
Queries whose PLAN intentionally changed are named via
`--override <name>[,<name>...]` — their prior values are excluded (the
old plan's timing is not a bound the new plan must meet); the override
list is explicit and printed, so a re-fold states its exceptions.

Guards (the round-10 lesson: one broken sweep poisoned 37 entries with
4-9 ms "timings" because the fold blindly took minima):
  * any sweep with a nonempty "failed" array is rejected outright;
  * any per-query value below FLOOR (50 ms — physically impossible for
    a Spark job on this host) is rejected outright;
  * all sweeps must cover the identical query set (a partial sweep must
    not silently shrink the reference catalog). Priors may cover a
    SUBSET (older catalogs were smaller); they contribute minima only
    where they overlap.

Usage: fold_quiet.py <out.json> <sweep1.json> [<sweep2.json> ...]
                     [--prior <quiet.json>]... [--override n1,n2]
Each sweep file holds the FULL JSON line Bench prints (the one with the
per-query "queries" map); priors are flat {query: sec} maps.
"""
import argparse
import json
import sys

FLOOR = 0.05


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("sweeps", nargs="+")
    ap.add_argument("--prior", action="append", default=[],
                    help="committed bench_quiet.json to fold monotonically against")
    ap.add_argument("--override", default="",
                    help="comma-separated queries whose plan changed: prior values excluded")
    ap.add_argument("--allow-subset", action="store_true",
                    help="permit subset-marked sweeps (the 32x reference is the full "
                         "catalog MINUS the audited Bench.Excluded32x map; bench_quiet "
                         "stays full-catalog-only without this flag)")
    args = ap.parse_args()

    sweeps = []
    for p in args.sweeps:
        with open(p) as f:
            s = json.load(f)
        if s.get("failed"):
            sys.exit(f"REJECT {p}: sweep has failed queries {s['failed']} — "
                     "a broken sweep must not enter the quiet reference")
        if s.get("subset") and not args.allow_subset:
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
            sys.exit(f"REJECT {p}: query set differs from {args.sweeps[0]} "
                     f"(missing {only_a}, extra {only_b})")

    overrides = {n for n in args.override.split(",") if n}
    unknown = overrides - names
    if unknown:
        sys.exit(f"REJECT: --override names not in the sweeps' catalog: {sorted(unknown)}")

    priors = []
    for p in args.prior:
        with open(p) as f:
            pr = json.load(f)
        bad = {k: v for k, v in pr.items() if v < FLOOR}
        if bad:
            sys.exit(f"REJECT prior {p}: sub-floor timings {bad}")
        stale = sorted(set(pr) - names)
        if stale:
            print(f"note: prior {p} has {len(stale)} queries no longer in the catalog "
                  f"(e.g. {stale[:3]}) — ignored")
        priors.append((p, pr))

    minima = {}
    raised = []
    for n in sorted(names):
        vals = [q[n] for _, q in sweeps]
        if n not in overrides:
            vals += [pr[n] for _, pr in priors if n in pr]
        minima[n] = min(vals)
        sweep_min = min(q[n] for _, q in sweeps)
        if minima[n] < sweep_min:
            raised.append(n)
    with open(args.out, "w") as f:
        f.write("{\n")
        f.write(",\n".join(f'"{k}": {v}' for k, v in sorted(minima.items())))
        f.write("\n}\n")
    total = sum(minima.values())
    print(f"wrote {args.out}: {len(minima)} queries, min-total {total:.1f}s "
          f"({total / len(minima):.2f} s/query) from {len(sweeps)} sweeps + "
          f"{len(priors)} priors; {len(raised)} entries kept prior (tighter) minima; "
          f"overrides: {sorted(overrides) or 'none'}")


if __name__ == "__main__":
    main()
