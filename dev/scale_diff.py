#!/usr/bin/env python3
"""Mechanical 10x scale-sweep gate — bench_diff's twin at ScaleBench data.

Round 8 proved sf0.1 budgets are blind to one-task-per-group sorts: the
enum-partition window class read fine at sf0.1 and needed a HAND audit to
find 17 affected queries. This tool mechanizes that audit: every round the
queries touched that round run at 1x (sf0.01) and at ScaleBench 10x of the
same dir, and two checks run over the bench-format JSONs:

 1. BUDGET: the 10x wall vs the committed SCALE_BUDGET.json, median-
    normalized exactly like bench_diff (the budget is min-of-runs on an
    idle box; a hot box shifts the whole run, a regression sticks out).
 2. SUPERLINEAR: the growth ratio t10/t1. Data grows 10x, so a scale-safe
    op reads <= ~6x (SCALE.md: round-8 heavy ops <= 5x wall at 30x data —
    constants amortize); an O(n^2) op reads ~100x. Anything above
    GROWTH_MAX with a real 10x wall flags — INCLUDING queries that have no
    budget yet, which is what catches a brand-new quadratic op before its
    budget is ever seeded. Sub-second 1x walls are floored so jitter on
    tiny queries can't fabricate a ratio.

A flagged query is a LEAD, not a verdict (same protocol as bench_diff):
re-run it in isolation before believing it. The deliberate-canary check
(`sbt "runMain graft.dev.ScaleCanary <1xDir> <10xDir>"` then
`scale_diff.py canary_10x.json canary_1x.json`) must ALWAYS flag — if it
stops flagging, the gate itself broke.

Usage:
  python3 dev/scale_diff.py <bench_10x.json> [bench_1x.json] [SCALE_BUDGET.json]
  python3 dev/scale_diff.py --fold <fresh_10x.json> [SCALE_BUDGET.json]

--fold min-folds a fresh clean 10x run into the budget file (seed budgets
from min-of->=2 runs — the round-8 verdict dinged one-shot seeding).
Exit code 1 if any query flags.
"""
import json
import statistics
import sys

FLAG_RATIO = 1.5      # budget check, after median normalization
ABS_FLOOR_SEC = 1.0   # budget check: only a full extra second is signal
GROWTH_MAX = 8.0      # 10x data: the full 488-query surface tops out ~4x
                      # (iterative graph ops); the quadratic canary reads
                      # ~12x even overhead-buffered. 8 splits the bands.
T1_FLOOR_SEC = 0.30   # floor the 1x wall so sub-second jitter can't flag
T10_MIN_SEC = 3.0     # growth only flags when the 10x wall actually hurts


def fold(fresh_path: str, budget_path: str) -> int:
    fresh = json.load(open(fresh_path))["queries"]
    try:
        bud = json.load(open(budget_path))
    except FileNotFoundError:
        bud = {"queries": {}}
    q = bud["queries"]
    for name, t in fresh.items():
        if t < 0:
            continue  # never fold a failure into a budget
        q[name] = round(min(t, q.get(name, float("inf"))), 3)
    bud["queries"] = dict(sorted(q.items()))
    bud["note"] = ("per-query wall sec, graft.Bench toRdd timing, at "
                   "ScaleBench 10x of sf0.01 on an idle local[32] box; "
                   "min-of-runs (fold every clean run in)")
    json.dump(bud, open(budget_path, "w"), indent=1)
    print(f"folded {len(fresh)} queries into {budget_path} "
          f"({len(q)} total)")
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--fold":
        return fold(sys.argv[2],
                    sys.argv[3] if len(sys.argv) > 3 else "SCALE_BUDGET.json")

    cur_path = sys.argv[1] if len(sys.argv) > 1 else "bench_10x.json"
    one_path = sys.argv[2] if len(sys.argv) > 2 else None
    bud_path = sys.argv[3] if len(sys.argv) > 3 else "SCALE_BUDGET.json"
    cur = json.load(open(cur_path))["queries"]
    one = json.load(open(one_path))["queries"] if one_path else {}
    try:
        bud = json.load(open(bud_path))["queries"]
    except FileNotFoundError:
        bud = {}

    flagged = False
    failed = [q for q, t in cur.items() if t < 0]
    for q in failed:
        print(f"FAILED {q} at 10x")
        flagged = True

    # -- budget check (median-normalized, bench_diff protocol) --
    common = sorted(set(cur) & set(bud))
    ratios = {q: cur[q] / bud[q] for q in common if bud[q] > 0 and cur[q] >= 0}
    med = statistics.median(ratios.values()) if ratios else 1.0
    if ratios:
        print(f"median 10x ratio {med:.2f} over {len(ratios)} budgeted "
              f"queries (box-speed indicator)")
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        if r / med > FLAG_RATIO and cur[q] - bud[q] > ABS_FLOOR_SEC:
            print(f"REGRESSION {q}: 10x budget {bud[q]:.2f}s -> {cur[q]:.2f}s "
                  f"({r:.2f}x, {r / med:.2f}x median-normalized)")
            flagged = True

    # -- super-linearity check (needs the 1x run) --
    for q in sorted(set(cur) & set(one)):
        if cur[q] < 0 or one[q] < 0:
            continue
        growth = cur[q] / max(one[q], T1_FLOOR_SEC)
        tag = "NEW " if q not in bud else ""
        if growth > GROWTH_MAX and cur[q] > T10_MIN_SEC:
            print(f"SUPERLINEAR {tag}{q}: {one[q]:.2f}s -> {cur[q]:.2f}s "
                  f"at 10x data ({growth:.1f}x wall; linear ops read <=6x)")
            flagged = True
        elif q not in bud:
            print(f"NEW {q}: 1x {one[q]:.2f}s, 10x {cur[q]:.2f}s "
                  f"({growth:.1f}x growth, no budget yet — fold one in)")

    if not flagged:
        print("OK: no 10x budget regression, nothing super-linear")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
