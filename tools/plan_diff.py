#!/usr/bin/env python3
"""Plan-audit regression gate (round-11 verdict #7).

Diffs two PLANS.json files (written by `sbt "runMain graft.PlanAudit"`)
and FAILS LOUD when any query's ShuffleExchange count grew, a scale-
hazard flag appeared, or a query lost its plan — the structural
regressions the markdown eyeball pass can miss. New queries and
improvements are reported informationally.

Close ritual:
    git show HEAD:PLANS.json > /tmp/plans_prev.json
    sbt "runMain graft.PlanAudit /root/testdata/sf0.001 PLANS.md PLANS.json"
    python3 tools/plan_diff.py /tmp/plans_prev.json PLANS.json

Exit 0 = no regressions; exit 1 lists them (an INTENDED change gets
re-run after noting the justification in BENCH.md and committing the
new PLANS.json as the fresh baseline).
"""
import json
import sys


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    regressions, improved, added, removed = [], [], [], []
    for q, n in sorted(new.items()):
        o = old.get(q)
        if o is None:
            added.append(q)
            continue
        if n["exchanges"] > o["exchanges"]:
            regressions.append(
                f"{q}: exchanges {o['exchanges']} -> {n['exchanges']}")
        elif n["exchanges"] < o["exchanges"]:
            improved.append(
                f"{q}: exchanges {o['exchanges']} -> {n['exchanges']}")
        new_flags = set(filter(None, n["flags"].split(","))) \
            - set(filter(None, o["flags"].split(",")))
        if new_flags:
            regressions.append(f"{q}: new flags {sorted(new_flags)}")
    for q in sorted(old):
        if q not in new:
            removed.append(q)
    if added:
        print(f"new queries ({len(added)}): {', '.join(added)}")
    if removed:
        # a vanished query is a registry removal — surface it, the
        # correctness gate decides if that was intended
        print(f"removed queries ({len(removed)}): {', '.join(removed)}")
    if improved:
        print(f"improved ({len(improved)}):")
        for line in improved:
            print(f"  {line}")
    if regressions:
        print(f"PLAN REGRESSIONS ({len(regressions)}):")
        for line in regressions:
            print(f"  {line}")
        sys.exit(1)
    print(f"plan gate: {len(new)} queries, no exchange/flag regressions")


if __name__ == "__main__":
    main()
