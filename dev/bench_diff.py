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

Control sanity (the normalization's own blind spot): a regression in
code shared by both controls would inflate control_median and every
normalized ratio — including the controls' own — reads clean. Two
cross-checks surface that:
 - the controls are ALSO checked on their raw in-run ratio vs their
   queries[] floors, exempt from normalization (WARNING line);
 - control_median is cross-checked against the all-query median
   (WARNING when they diverge beyond tolerance — either the controls
   hit contention the surface didn't, or vice versa).
Warnings don't gate (a contended control pass is routine); a warning
plus a clean flag set means re-run the controls in isolation before
trusting the artifact.

Resolved annex (round-11 verdict item 1): a committed close snapshot
may carry `"resolved": {q: {"in_run": s, "passes": [{"t": s,
"control": m}, ...], "verdict": ...}}` — isolation re-measures of the
queries the in-run pass flagged (dev/close_round.sh writes it via
resolve_flags.py). A flag CLEARS when any isolation pass is inside the
gate after normalizing by that pass's own control factor; the committed
artifact then exits 0 by construction, carrying its own clearance
evidence instead of a commit-message argument.

A flagged query is a LEAD, not a verdict: transient contention can spike
single queries 5-10x inside a long full run (observed for
q27_minhash_lsh: 11.7s mid-run, 1.6s in isolation, same code). Re-run
flagged queries in isolation (`sbt "runMain graft.Bench q27,..."`)
before treating the flag as a regression.

Usage: python3 dev/bench_diff.py [bench_full.json [BENCH_BUDGET.json]]
       python3 dev/bench_diff.py --flagged-names [bench_full.json [BUDGET]]
       python3 dev/bench_diff.py --selftest
Exit code 1 if any query flags after control normalization and
annex clearance.
"""
import json
import statistics
import sys

FLAG_RATIO = 1.5
# budgets are min-of-runs while a check is one shot, so sub-second queries
# routinely read 2-3x their floor on a busy box; only a full extra second
# of wall clock is signal
ABS_FLOOR_SEC = 1.0
# control sanity tolerances (warnings, not gates)
CONTROLS = ("q19_promo_parse", "q199_kmv")
DIVERGE_TOL = 1.4   # control_median vs all-query median, either direction
CONTROL_RAW_TOL = 2.0  # a control's raw in-run ratio vs its queries[] floor


def _cleared_by_annex(annex, budget):
    """True if any isolation pass reads inside the gate (normalized by
    that pass's own control factor), i.e. the in-run flag was a one-shot
    spike, not a regression."""
    if not annex:
        return False
    for p in annex.get("passes", []):
        t, ctrl = p.get("t", -1.0), p.get("control") or 1.0
        if t < 0 or ctrl <= 0 or budget <= 0:
            continue
        if (t / budget) / ctrl <= FLAG_RATIO or (t - budget) <= ABS_FLOOR_SEC:
            return True
    return False


def check(cur_doc, bud_doc):
    """Pure check logic: returns
    (flagged, failed, new, norm, norm_src, warnings, cleared).

    flagged: [(query, budget_sec, cur_sec, raw_ratio, normed_ratio)]
    failed:  [query] with cur time < 0
    new:     [query] present in cur but not in budget
    norm:    the box-speed divisor applied to every ratio
    warnings: control-sanity WARNING strings (never gate)
    cleared: [(query, budget, cur_sec, best_iso_sec)] flags cleared by
             the artifact's own resolved annex
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

    warnings = []
    if ctrl and ctrl > 0 and ratios:
        allq = statistics.median(ratios.values())
        if allq / ctrl > DIVERGE_TOL or ctrl / allq > DIVERGE_TOL:
            warnings.append(
                f"WARNING control/all-query divergence: control_median "
                f"{ctrl:.2f} vs all-query median {allq:.2f} — either the "
                f"control pass hit contention the surface didn't, or a "
                f"shared-path change moved the whole surface; re-run "
                f"controls in isolation before trusting this artifact")
    # controls checked raw (exempt from normalization): a regression in
    # code both controls share inflates norm and self-masks everywhere
    # EXCEPT here
    for q in CONTROLS:
        r = ratios.get(q)
        if r and r > CONTROL_RAW_TOL and cur[q] - bud[q] > ABS_FLOOR_SEC:
            warnings.append(
                f"WARNING control {q} raw in-run ratio {r:.2f}x its floor "
                f"({bud[q]:.2f}s -> {cur[q]:.2f}s) — if this persists "
                f"across passes, a shared-path regression may be "
                f"inflating control_median and masking itself")

    resolved = cur_doc.get("resolved", {})
    flagged, cleared = [], []
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        # a genuine regression sticks out above the box factor; a
        # uniformly slow box raises norm and every ratio together
        if r / norm > FLAG_RATIO and cur[q] - bud[q] > ABS_FLOOR_SEC:
            ann = resolved.get(q)
            if _cleared_by_annex(ann, bud[q]):
                best = min(p["t"] for p in ann["passes"] if p.get("t", -1) >= 0)
                cleared.append((q, bud[q], cur[q], best))
            else:
                flagged.append((q, bud[q], cur[q], r, r / norm))
    failed = sorted(q for q, t in cur.items() if t < 0)
    return flagged, failed, new, norm, norm_src, warnings, cleared


def selftest():
    bud = {"queries": {"q19_promo_parse": 1.8, "q199_kmv": 0.946,
                       "qa": 2.0, "qb": 4.0, "qc": 0.2}}

    # 1. uniformly 1.6x-contended box, controls measured at the same 1.6x:
    #    nothing flags (the pre-control protocol would have needed a
    #    forensic session to dismiss qb at 6.4s vs its 4.0 floor)
    cur = {"control_median": 1.6,
           "queries": {"qa": 3.2, "qb": 6.4, "qc": 0.32,
                       "q19_promo_parse": 2.88, "q199_kmv": 1.514}}
    flagged, failed, new, norm, _, warns, _ = check(cur, bud)
    assert not flagged and not failed and not new, (flagged, failed, new)
    assert abs(norm - 1.6) < 1e-9
    assert not warns, warns  # uniform slowdown: controls track the surface

    # 2. same contended box, but qb genuinely regressed to 4x its floor:
    #    exactly qb flags, with the normed ratio (not the raw 4x)
    cur["queries"]["qb"] = 16.0
    flagged, _, _, _, _, _, _ = check(cur, bud)
    assert [f[0] for f in flagged] == ["qb"], flagged
    assert abs(flagged[0][4] - (16.0 / 4.0) / 1.6) < 1e-9

    # 3. idle box (controls at floor), a real 2x+1s regression flags
    cur = {"control_median": 1.0,
           "queries": {"qa": 2.1, "qb": 9.0, "qc": 0.25}}
    flagged, _, _, _, _, _, _ = check(cur, bud)
    assert [f[0] for f in flagged] == ["qb"], flagged

    # 4. sub-second jitter never flags even at 3x ratio (abs floor)
    cur = {"control_median": 1.0, "queries": {"qc": 0.6}}
    flagged, _, _, _, _, _, _ = check(cur, bud)
    assert not flagged, flagged

    # 5. legacy artifact without controls: falls back to all-query
    #    median, so a uniformly 1.5x box still doesn't flag
    cur = {"queries": {"qa": 3.0, "qb": 6.0, "qc": 0.3,
                       "q19_promo_parse": 2.7, "q199_kmv": 1.419}}
    flagged, failed, new, norm, src, _, _ = check(cur, bud)
    assert not flagged and "median" in src, (flagged, src)

    # 6. failures surface as failed, never as fast successes
    cur = {"control_median": 1.0, "queries": {"qa": -1.0}}
    _, failed, _, _, _, _, _ = check(cur, bud)
    assert failed == ["qa"], failed

    # 7. self-masking sentinel: the surface reads 2.2x while the controls
    #    claim 1.05x -> divergence WARNING (but flags still computed
    #    against the control factor: everything over gate flags)
    cur = {"control_median": 1.05,
           "queries": {"qa": 4.4, "qb": 8.8, "qc": 0.44}}
    flagged, _, _, _, _, warns, _ = check(cur, bud)
    assert any("divergence" in w for w in warns), warns
    assert len(flagged) == 2, flagged  # qa & qb over gate; qc abs-floored

    # 8. a control 2.5x its own in-run floor raw-warns even when the
    #    inflated control_median makes its normalized ratio read clean
    cur = {"control_median": 2.4,
           "queries": {"q19_promo_parse": 4.5, "q199_kmv": 2.27,
                       "qa": 4.8, "qb": 9.6}}
    flagged, _, _, _, _, warns, _ = check(cur, bud)
    assert not flagged, flagged  # everything normalizes clean...
    assert any("q19_promo_parse" in w for w in warns), warns  # ...but raw warns

    # 9. resolved annex clears a one-shot spike: in-run 19.2s vs 4.0
    #    floor, isolation pass 4.2s at control 1.05 -> cleared, exit 0
    cur = {"control_median": 1.0,
           "queries": {"qb": 19.2},
           "resolved": {"qb": {"in_run": 19.2,
                               "passes": [{"t": 4.2, "control": 1.05}],
                               "verdict": "cleared"}}}
    flagged, _, _, _, _, _, cleared = check(cur, bud)
    assert not flagged and [c[0] for c in cleared] == ["qb"], (flagged, cleared)

    # 10. an annex whose isolation CONFIRMS the regression does not clear
    cur["resolved"]["qb"]["passes"] = [{"t": 16.0, "control": 1.0},
                                       {"t": 15.5, "control": 1.0}]
    flagged, _, _, _, _, _, cleared = check(cur, bud)
    assert [f[0] for f in flagged] == ["qb"] and not cleared, (flagged, cleared)

    print("selftest OK (10 cases)")
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if argv and argv[0] == "--selftest":
        return selftest()
    names_only = bool(argv) and argv[0] == "--flagged-names"
    if names_only:
        argv = argv[1:]
    cur_path = argv[0] if len(argv) > 0 else "bench_full.json"
    bud_path = argv[1] if len(argv) > 1 else "BENCH_BUDGET.json"
    cur_doc = json.load(open(cur_path))
    bud_doc = json.load(open(bud_path))
    flagged, failed, new, norm, norm_src, warnings, cleared = \
        check(cur_doc, bud_doc)

    if names_only:
        # machine-readable mode for close_round.sh/resolve_flags.py: just
        # the flagged query names, one per line, exit code as usual
        for q, *_ in flagged:
            print(q)
        return 1 if (flagged or failed) else 0

    print(f"box-speed factor {norm:.2f} from {norm_src}")
    for w in warnings:
        print(w)
    for q in new:
        print(f"NEW    {q}: {cur_doc['queries'][q]:.2f}s (no budget yet)")
    for q in failed:
        print(f"FAILED {q}")
    for q, b, c, best in cleared:
        print(f"RESOLVED {q}: in-run {c:.2f}s vs {b:.2f}s floor cleared by "
              f"isolation ({best:.2f}s) — annex evidence in the artifact")
    for q, b, c, r, rn in flagged:
        print(f"REGRESSION {q}: {b:.2f}s -> {c:.2f}s "
              f"({r:.2f}x raw, {rn:.2f}x control-normalized)")
    if not flagged and not failed:
        print(f"OK: no per-query regression above {FLAG_RATIO}x "
              "(control-normalized)")
    return 1 if (flagged or failed) else 0


if __name__ == "__main__":
    sys.exit(main())
