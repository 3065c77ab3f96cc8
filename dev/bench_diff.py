#!/usr/bin/env python3
"""Mechanical per-query bench regression check.

Compares a fresh bench_full.json against the committed BENCH_BUDGET.json
and flags every query slower than FLAG_RATIO x its budget (plus an
absolute floor so sub-100ms jitter never flags). Box speed varies run to
run (the budget file records an idle-box run; a contended box is ~1.5x
slower across the board), so the report also prints the median ratio —
if the median itself is >1.3, suspect the box before any single query.

A flagged query is a LEAD, not a verdict: transient box contention can
spike single queries 5-10x inside a long full run (observed for
q27_minhash_lsh: 11.7s mid-run, 1.6s in isolation, same code). Re-run
flagged queries in isolation (`sbt "runMain graft.Bench q27,..."`)
before treating the flag as a regression.

Usage: python3 dev/bench_diff.py [bench_full.json [BENCH_BUDGET.json]]
Exit code 1 if any query flags after median normalization.
"""
import json
import statistics
import sys

FLAG_RATIO = 1.5
# budgets are min-of-runs while a check is one shot, so sub-second queries
# routinely read 2-3x their floor on a busy box; only a full extra second
# of wall clock is signal
ABS_FLOOR_SEC = 1.0


def main() -> int:
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
    bud_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BUDGET.json"
    cur = json.load(open(cur_path))["queries"]
    bud = json.load(open(bud_path))["queries"]

    common = sorted(set(cur) & set(bud))
    new = sorted(set(cur) - set(bud))
    ratios = {q: cur[q] / bud[q] for q in common if bud[q] > 0 and cur[q] >= 0}
    med = statistics.median(ratios.values()) if ratios else 1.0

    flagged = []
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        # normalize by the run's median so a uniformly slow box doesn't
        # flag everything; a genuine regression sticks out above it
        if r / med > FLAG_RATIO and cur[q] - bud[q] > ABS_FLOOR_SEC:
            flagged.append((q, bud[q], cur[q], r))

    print(f"median ratio {med:.2f} over {len(ratios)} queries "
          f"(box-speed indicator; budget is an idle-box run)")
    for q in new:
        print(f"NEW    {q}: {cur[q]:.2f}s (no budget yet)")
    failed = [q for q, t in cur.items() if t < 0]
    for q in failed:
        print(f"FAILED {q}")
    for q, b, c, r in flagged:
        print(f"REGRESSION {q}: {b:.2f}s -> {c:.2f}s "
              f"({r:.2f}x, {r / med:.2f}x median-normalized)")
    if not flagged and not failed:
        print("OK: no per-query regression above "
              f"{FLAG_RATIO}x (median-normalized)")
    return 1 if (flagged or failed) else 0


if __name__ == "__main__":
    sys.exit(main())
