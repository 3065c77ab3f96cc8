#!/usr/bin/env python3
"""Mechanical scale-sweep gate — bench_diff's twin at ScaleBench data.

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
    GROWTH_PER_X * factor with a real 10x wall flags — INCLUDING queries
    that have no budget yet, which is what catches a brand-new quadratic
    op before its budget is ever seeded. Sub-second 1x walls are floored
    so jitter on tiny queries can't fabricate a ratio.

TIERS (round-9 verdict item 3): the 10x sweep with an 8x growth ceiling
can hide O(n * rounds) growth in the ITERATIVE graph family, where the
round count (graph diameter) itself grows with data. The 30x tier
(`--tier 30`, budgets under SCALE_BUDGET.json["queries30"]) stretches the
lever arm: at 30x data a linear op reads <= ~24x, an O(n * rounds) op
drifts visibly above it, and the quadratic canary reads ~900x.

A flagged query is a LEAD, not a verdict (same protocol as bench_diff):
re-run it in isolation before believing it. The deliberate-canary check
(`sbt "runMain graft.dev.ScaleCanary <1xDir> <NxDir> [suffix]"` then
`scale_diff.py [--tier N] canary_Nx.json canary_1x.json`) must ALWAYS
flag — if it stops flagging, the gate itself broke.

Usage:
  python3 dev/scale_diff.py [--tier N] <bench_Nx.json> [bench_1x.json] [SCALE_BUDGET.json]
  python3 dev/scale_diff.py [--tier N] --fold <fresh_Nx.json> [SCALE_BUDGET.json]

--fold min-folds a fresh clean run into the budget file (seed budgets
from min-of->=2 runs — the round-8 verdict dinged one-shot seeding).
Exit code 1 if any query flags.
"""
import json
import statistics
import sys

FLAG_RATIO = 1.5      # budget check, after median normalization
ABS_FLOOR_SEC = 1.0   # budget check: only a full extra second is signal
GROWTH_PER_X = 0.8    # growth ceiling = 0.8 * factor: 8x at 10x data
                      # (full 512-query surface tops out ~4x; the
                      # quadratic canary reads ~12x even overhead-
                      # buffered), 24x at 30x (canary ~100x+)
T1_FLOOR_SEC = 0.30   # floor the 1x wall so sub-second jitter can't flag
TN_MIN_PER_X = 0.30   # growth only flags when the Nx wall actually
                      # hurts: 3 s at 10x, 9 s at 30x


def budget_key(factor: int) -> str:
    return "queries" if factor == 10 else f"queries{factor}"


def fold(fresh_path: str, budget_path: str, factor: int) -> int:
    fresh = json.load(open(fresh_path))["queries"]
    try:
        bud = json.load(open(budget_path))
    except FileNotFoundError:
        bud = {}
    key = budget_key(factor)
    q = bud.setdefault(key, {})
    for name, t in fresh.items():
        if t < 0:
            continue  # never fold a failure into a budget
        q[name] = round(min(t, q.get(name, float("inf"))), 3)
    bud[key] = dict(sorted(q.items()))
    bud["note"] = ("per-query wall sec, graft.Bench toRdd timing, at "
                   "ScaleBench 10x of sf0.01 on an idle local[32] box; "
                   "min-of-runs (fold every clean run in). queries30 = "
                   "the 30x tier for the iterative graph family (wider "
                   "lever arm for O(n*rounds) growth).")
    json.dump(bud, open(budget_path, "w"), indent=1)
    print(f"folded {len(fresh)} queries into {budget_path}[{key}] "
          f"({len(q)} total)")
    return 0


def main() -> int:
    args = sys.argv[1:]
    factor = 10
    if args and args[0] == "--tier":
        factor = int(args[1])
        args = args[2:]
    if args and args[0] == "--fold":
        return fold(args[1], args[2] if len(args) > 2 else "SCALE_BUDGET.json",
                    factor)

    cur_path = args[0] if args else "bench_10x.json"
    one_path = args[1] if len(args) > 1 else None
    bud_path = args[2] if len(args) > 2 else "SCALE_BUDGET.json"
    cur = json.load(open(cur_path))["queries"]
    one = json.load(open(one_path))["queries"] if one_path else {}
    try:
        bud = json.load(open(bud_path)).get(budget_key(factor), {})
    except FileNotFoundError:
        bud = {}
    growth_max = GROWTH_PER_X * factor
    tn_min = TN_MIN_PER_X * factor

    flagged = False
    failed = [q for q, t in cur.items() if t < 0]
    for q in failed:
        print(f"FAILED {q} at {factor}x")
        flagged = True

    # -- budget check (median-normalized, bench_diff protocol) --
    common = sorted(set(cur) & set(bud))
    ratios = {q: cur[q] / bud[q] for q in common if bud[q] > 0 and cur[q] >= 0}
    med = statistics.median(ratios.values()) if ratios else 1.0
    if ratios:
        print(f"median {factor}x ratio {med:.2f} over {len(ratios)} budgeted "
              f"queries (box-speed indicator)")
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        if r / med > FLAG_RATIO and cur[q] - bud[q] > ABS_FLOOR_SEC:
            print(f"REGRESSION {q}: {factor}x budget {bud[q]:.2f}s -> "
                  f"{cur[q]:.2f}s ({r:.2f}x, {r / med:.2f}x "
                  f"median-normalized)")
            flagged = True

    # -- super-linearity check (needs the 1x run) --
    for q in sorted(set(cur) & set(one)):
        if cur[q] < 0 or one[q] < 0:
            continue
        growth = cur[q] / max(one[q], T1_FLOOR_SEC)
        tag = "NEW " if q not in bud else ""
        if growth > growth_max and cur[q] > tn_min:
            print(f"SUPERLINEAR {tag}{q}: {one[q]:.2f}s -> {cur[q]:.2f}s "
                  f"at {factor}x data ({growth:.1f}x wall; linear ops read "
                  f"<={growth_max * 0.75:.0f}x)")
            flagged = True
        elif q not in bud:
            print(f"NEW {q}: 1x {one[q]:.2f}s, {factor}x {cur[q]:.2f}s "
                  f"({growth:.1f}x growth, no budget yet — fold one in)")

    if not flagged:
        print(f"OK: no {factor}x budget regression, nothing super-linear")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
