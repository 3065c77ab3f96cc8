#!/usr/bin/env python3
"""Close-chain bench-flag resolution (round-11 verdict item 1).

The in-run close bench has forensically-established one-shot tails: every
flag in rounds 8-11's close snapshots turned out to be a spike that an
isolation re-run cleared — but the clearance evidence lived in commit
messages, so the COMMITTED snapshot failed the repo's own
`dev/bench_diff.py` gate. This script makes the close chain resolve its
own flags mechanically, exactly the way the round-11 judge did by hand:

 1. run the bench_diff check on the snapshot;
 2. re-run every flagged query in isolation (SPARK_GRAFT_CONTROLS=1 so
    each pass carries its own box-speed factor), min-of-N_PASSES;
 3. fold the evidence into the snapshot under a `"resolved"` annex —
    per query: the in-run reading, every isolation pass's (t, control),
    and the verdict ("cleared" / "regression");
 4. re-run the check: `bench_diff <snapshot>` now exits 0 by
    construction unless an isolation pass CONFIRMED the regression, in
    which case this script (and the close) fails loudly.

Failures (t < 0) are never resolvable by re-measurement and fail
immediately.

Usage: python3 dev/resolve_flags.py SNAPSHOT.json [SF_DIR] [BUDGET.json]
Exit 0 = snapshot clean (possibly after annexing clearance evidence).
"""
import json
import os
import subprocess
import sys
import tempfile

import bench_diff

N_PASSES = 2


def run_isolation_pass(queries, sf_dir, out_path, repo_root):
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_CONTROLS="1",
               SPARK_GRAFT_BENCH_OUT=out_path)
    cmd = ["sbt", "-batch", f"runMain graft.Bench {','.join(queries)}"]
    print(f"[resolve] isolation pass: {' '.join(cmd)}", flush=True)
    rc = subprocess.call(cmd, env=env, cwd=repo_root)
    if rc != 0 or not os.path.exists(out_path):
        print(f"[resolve] isolation pass failed (rc={rc})", file=sys.stderr)
        return None
    return json.load(open(out_path))


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    snap_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    bud_path = sys.argv[3] if len(sys.argv) > 3 else "BENCH_BUDGET.json"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    snap = json.load(open(snap_path))
    bud = json.load(open(bud_path))
    flagged, failed, _, _, _, warnings, _ = bench_diff.check(snap, bud)
    for w in warnings:
        print(w)
    if failed:
        print(f"[resolve] FAILED queries cannot be resolved by re-measurement: "
              f"{failed}", file=sys.stderr)
        return 1
    if not flagged:
        print("[resolve] no flags — snapshot already clean")
        return 0

    names = [f[0] for f in flagged]
    in_run = {f[0]: f[2] for f in flagged}
    print(f"[resolve] {len(names)} flag(s) to resolve in isolation "
          f"(min-of-{N_PASSES}, controls on): {', '.join(names)}")

    passes = []  # one {query: (t, control)} per pass
    for i in range(N_PASSES):
        out = os.path.join(tempfile.gettempdir(),
                           f"resolve_pass{i}_{os.getpid()}.json")
        doc = run_isolation_pass(names, sf_dir, out, repo_root)
        if doc is None:
            return 1
        ctrl = doc.get("control_median") or 1.0
        passes.append({q: (doc["queries"].get(q, -1.0), ctrl) for q in names})

    annex = snap.setdefault("resolved", {})
    for q in names:
        entry = {"in_run": in_run[q],
                 "passes": [{"t": p[q][0], "control": p[q][1]}
                            for p in passes]}
        annex[q] = entry

    # verdict per query from the same clearance rule bench_diff applies
    for q in names:
        b = bud["queries"][q]
        ok = bench_diff._cleared_by_annex(annex[q], b)
        annex[q]["verdict"] = "cleared" if ok else "regression"
        best = min((p["t"] for p in annex[q]["passes"] if p["t"] >= 0),
                   default=-1.0)
        print(f"[resolve] {q}: in-run {in_run[q]:.2f}s, isolation best "
              f"{best:.2f}s vs {b:.2f}s floor -> {annex[q]['verdict']}")

    json.dump(snap, open(snap_path, "w"))
    print(f"[resolve] annex written to {snap_path}")

    flagged2, failed2, *_ = bench_diff.check(snap, bud)
    if flagged2 or failed2:
        print(f"[resolve] isolation CONFIRMED regression(s): "
              f"{[f[0] for f in flagged2]} — fix or re-base per the "
              f"drift protocol before closing", file=sys.stderr)
        return 1
    print("[resolve] snapshot clean: bench_diff exits 0 on the committed "
          "artifact, clearance evidence annexed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
