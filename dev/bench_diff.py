#!/usr/bin/env python3
"""Mechanical per-query bench regression check, control-normalized.

Compares a fresh bench_full.json against the committed BENCH_BUDGET.json
and flags every query slower than FLAG_RATIO x its budget after dividing
by the run's BOX-SPEED FACTOR. Box speed varies run to run (the budget
file records idle-box / full-run-context floors; a contended box is
1.2-1.7x slower across the board), so raw ratios lie.

The box-speed factor, in preference order:
 1. `control_median` from the bench JSON itself — graft.Bench times two
    pinned control queries (q19_promo_parse regex/codegen-bound,
    q199_kmv shuffle/agg-bound, floors committed in Bench.controlFloors
    == BENCH_BUDGET.json) FIRST each full run and emits
    median(time/floor). Controls are pinned, so surface churn (new or
    reworked queries) can never shift the normalizer.
 2. Fallback for pre-round-11 artifacts without a controls block: the
    median ratio over all common queries (the round-8..10 protocol).

A flagged query is a LEAD, not a verdict: transient contention can spike
single queries 5-10x inside a long full run (observed for
q27_minhash_lsh: 11.7s mid-run, 1.6s in isolation, same code). Re-run
flagged queries in isolation (`sbt "runMain graft.Bench q27,..."`)
before treating the flag as a regression.

Usage: python3 dev/bench_diff.py [bench_full.json [BENCH_BUDGET.json]]
       python3 dev/bench_diff.py --selftest
Exit code 1 if any query flags after control normalization.
"""
import json
import statistics
import sys

FLAG_RATIO = 1.5
# budgets are min-of-runs while a check is one shot, so sub-second queries
# routinely read 2-3x their floor on a busy box; only a full extra second
# of wall clock is signal
ABS_FLOOR_SEC = 1.0


def check(cur_doc, bud_doc):
    """Pure check logic: returns (flagged, failed, new, norm, norm_src).

    flagged: [(query, budget_sec, cur_sec, raw_ratio, normed_ratio)]
    failed:  [query] with cur time < 0
    new:     [query] present in cur but not in budget
    norm:    the box-speed divisor applied to every ratio
    """
    cur = cur_doc["queries"]
    bud = bud_doc["queries"]
    common = sorted(set(cur) & set(bud))
    new = sorted(set(cur) - set(bud))
    ratios = {q: cur[q] / bud[q] for q in common if bud[q] > 0 and cur[q] >= 0}

    ctrl = cur_doc.get("control_median")
    if ctrl and ctrl > 0:
        norm, norm_src = ctrl, "control_median (pinned controls)"
    elif ratios:
        norm = statistics.median(ratios.values())
        norm_src = "all-query median (no controls block in bench JSON)"
    else:
        norm, norm_src = 1.0, "none"

    flagged = []
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        # a genuine regression sticks out above the box factor; a
        # uniformly slow box raises norm and every ratio together
        if r / norm > FLAG_RATIO and cur[q] - bud[q] > ABS_FLOOR_SEC:
            flagged.append((q, bud[q], cur[q], r, r / norm))
    failed = sorted(q for q, t in cur.items() if t < 0)
    return flagged, failed, new, norm, norm_src


def selftest():
    bud = {"queries": {"q19_promo_parse": 1.8, "q199_kmv": 0.946,
                       "qa": 2.0, "qb": 4.0, "qc": 0.2}}

    # 1. uniformly 1.6x-contended box, controls measured at the same 1.6x:
    #    nothing flags (the pre-control protocol would have needed a
    #    forensic session to dismiss qb at 6.4s vs its 4.0 floor)
    cur = {"control_median": 1.6,
           "queries": {"qa": 3.2, "qb": 6.4, "qc": 0.32,
                       "q19_promo_parse": 2.88, "q199_kmv": 1.514}}
    flagged, failed, new, norm, _ = check(cur, bud)
    assert not flagged and not failed and not new, (flagged, failed, new)
    assert abs(norm - 1.6) < 1e-9

    # 2. same contended box, but qb genuinely regressed to 4x its floor:
    #    exactly qb flags, with the normed ratio (not the raw 4x)
    cur["queries"]["qb"] = 16.0
    flagged, _, _, _, _ = check(cur, bud)
    assert [f[0] for f in flagged] == ["qb"], flagged
    assert abs(flagged[0][4] - (16.0 / 4.0) / 1.6) < 1e-9

    # 3. idle box (controls at floor), a real 2x+1s regression flags
    cur = {"control_median": 1.0,
           "queries": {"qa": 2.1, "qb": 9.0, "qc": 0.25}}
    flagged, _, _, _, _ = check(cur, bud)
    assert [f[0] for f in flagged] == ["qb"], flagged

    # 4. sub-second jitter never flags even at 3x ratio (abs floor)
    cur = {"control_median": 1.0, "queries": {"qc": 0.6}}
    flagged, _, _, _, _ = check(cur, bud)
    assert not flagged, flagged

    # 5. legacy artifact without controls: falls back to all-query
    #    median, so a uniformly 1.5x box still doesn't flag
    cur = {"queries": {"qa": 3.0, "qb": 6.0, "qc": 0.3,
                       "q19_promo_parse": 2.7, "q199_kmv": 1.419}}
    flagged, failed, new, norm, src = check(cur, bud)
    assert not flagged and "median" in src, (flagged, src)

    # 6. failures surface as failed, never as fast successes
    cur = {"control_median": 1.0, "queries": {"qa": -1.0}}
    _, failed, _, _, _ = check(cur, bud)
    assert failed == ["qa"], failed

    print("selftest OK (6 cases)")
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        return selftest()
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "bench_full.json"
    bud_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_BUDGET.json"
    cur_doc = json.load(open(cur_path))
    bud_doc = json.load(open(bud_path))
    flagged, failed, new, norm, norm_src = check(cur_doc, bud_doc)

    print(f"box-speed factor {norm:.2f} from {norm_src}")
    for q in new:
        print(f"NEW    {q}: {cur_doc['queries'][q]:.2f}s (no budget yet)")
    for q in failed:
        print(f"FAILED {q}")
    for q, b, c, r, rn in flagged:
        print(f"REGRESSION {q}: {b:.2f}s -> {c:.2f}s "
              f"({r:.2f}x raw, {rn:.2f}x control-normalized)")
    if not flagged and not failed:
        print(f"OK: no per-query regression above {FLAG_RATIO}x "
              "(control-normalized)")
    return 1 if (flagged or failed) else 0


if __name__ == "__main__":
    sys.exit(main())
