#!/usr/bin/env python3
"""Round-12 budget fold (close checklist step 4), run AFTER the close
chain: min-fold the session's three full-run-context passes into
BENCH_BUDGET.json.

 - existing floors: min(current, p1, p2, close) — the standard
   idle-box-improvement fold (readings are one-shot or auto-retry minima
   from complete 523-query runs, exactly the floors' measurement context);
 - q521-q523 (new this round): seeded min-of-3 full-run-context per the
   round-9/10 protocol;
 - q520: the round-11 verdict item 5 re-base — its old 1.25 floor was
   seeded from cold subset-context runs and reads conservative; the
   full-run minima replace it via the same min().

One-shot helper, kept for provenance (the note records the fold).
"""
import json
import sys

PASSES = ["/tmp/full_r12_p1.json", "/tmp/full_r12_p2.json"]


def main():
    close = sys.argv[1] if len(sys.argv) > 1 else "BENCH_CLOSE_r12.json"
    doc = json.load(open("BENCH_BUDGET.json"))
    bud = doc["queries"]
    runs = [json.load(open(p))["queries"] for p in PASSES + [close]]
    folded, seeded = [], []
    for run in runs:
        for q, t in run.items():
            if t < 0:
                continue
            if q not in bud:
                bud[q] = round(t, 3)
                seeded.append(q)
            elif t < bud[q]:
                bud[q] = round(t, 3)
                if q not in folded:
                    folded.append(q)
    doc["total"] = round(sum(bud.values()), 3)
    q520 = bud.get("q520_drift_timeline")
    doc["note"] += (
        " || round 12 close: floors min-folded from THREE full-run-context "
        f"passes (523 queries each, controls 0.911/1.159/close); {len(folded)} "
        "floors folded down; q521-q523 seeded min-of-3 full-run-context "
        "(q521 %s, q522 %s, q523 %s); q520 re-based from full runs per the "
        "r11-verdict item 5 (%s, was 1.25 subset-context)." % (
            bud.get("q521_sample_quantiles"), bud.get("q522_sketch_merge"),
            bud.get("q523_quantile_rank_audit"), q520))
    json.dump(doc, open("BENCH_BUDGET.json", "w"))
    print(f"folded {len(folded)} floors down; seeded {sorted(set(seeded))}")
    print("q520 floor now", q520, "| new total", doc["total"])


if __name__ == "__main__":
    main()
