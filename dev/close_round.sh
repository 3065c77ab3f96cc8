#!/usr/bin/env bash
# Round-close gate chain (the .claude/skills/verify/SKILL.md checklist,
# steps 1-3 + the canary, in order, fail-fast). Run from the repo root on
# an otherwise-idle box; budget folding (steps 4-5) stays a human
# decision because flagged regressions must be re-measured in isolation
# before any budget moves.
#
#   dev/close_round.sh [sf001_dir] [sf01_dir] [scale10_dir]
#
# Exit 0 = every gate green AND the scale canary still flags (exit 1
# from scale_diff on the canary pair is the EXPECTED, healthy outcome).
set -uo pipefail
cd "$(dirname "$0")/.."

SF001="${1:-/root/testdata/sf0.01}"
SF01="${2:-/root/testdata/sf0.1}"
SCALE10="${3:-tmp/scale10}"
OUT="${TMPDIR:-/tmp}/close_round_$$"
mkdir -p "$OUT"

# Step 5 needs the ScaleBench 10x dir; fail early with a clear message
# instead of an opaque Spark read error three gates in.
if [ ! -d "$SCALE10/events.parquet" ]; then
  echo "FATAL: $SCALE10/events.parquet missing - generate it first:" >&2
  echo "  sbt \"runMain graft.ScaleBench $SF001 $SCALE10 10\"" >&2
  exit 1
fi

echo "== [1/5] sbt test =="
sbt -batch test || exit 1

echo "== [2/5] Verify + DuckDB oracle at $SF001 =="
SPARK_GRAFT_CPUS=24 sbt -batch "runMain graft.Verify $SF001 $OUT/verify" || exit 1
python3 dev/check_oracle.py "$SF001" "$OUT/verify" || exit 1

echo "== [3/5] full Bench at $SF01 =="
SPARK_GRAFT_SF_DIR="$SF01" SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" || exit 1

# Round-10 verdict item 2: bench_full.json is gitignored and the driver
# overwrites it in place, so the close-run evidence (total + per-query
# walls + the run's own control_median) must be COMMITTED under a
# round-stamped name or it exists only in commit-message prose. ROUND
# defaults to max(BENCH_CLOSE_r*.json index)+1 — the artifact THIS
# script owns, so the invariant holds whether or not the driver has
# already dropped the round's CORRECTNESS file into the tree (the
# CORRECTNESS-based default mislabeled exactly that case).
if [ -z "${ROUND:-}" ]; then
  LAST=$(ls BENCH_CLOSE_r*.json 2>/dev/null \
    | sed -E 's/.*_r0*([0-9]+)\.json/\1/' | sort -n | tail -1)
  ROUND=$(( ${LAST:-0} + 1 ))
fi
SNAP=$(printf 'BENCH_CLOSE_r%02d.json' "$ROUND")
cp bench_full.json "$SNAP"
echo "snapshot: $SNAP (commit it; README's band cites it)"

# Round-11 verdict item 1: the close chain resolves its OWN flags. Every
# in-run flag gets an automatic isolation re-measure (controls on,
# min-of-2); the clearance evidence is annexed INTO the committed
# snapshot ("resolved" key) so `bench_diff $SNAP` exits 0 by
# construction — or an isolation pass CONFIRMS the regression and the
# close fails here, before anything is committed.
echo "== [4/5] bench_diff + automatic flag resolution =="
python3 dev/resolve_flags.py "$SNAP" "$SF01" || exit 1
python3 dev/bench_diff.py "$SNAP" || exit 1

echo "== [5/5] scale canary must still flag =="
sbt -batch "runMain graft.dev.ScaleCanary $SF001 $SCALE10" || exit 1
if python3 dev/scale_diff.py canary_10x.json canary_1x.json; then
  echo "FATAL: the quadratic canary no longer flags - the scale gate is dead"
  exit 1
fi

echo "== [6/6] 30x tier: iterative graph + shingle/window + estimator families (flags are LEADS) =="
if [ -d tmp/scale30/events.parquet ]; then
  # graph: round counts (diameter) grow with data, the 10x lever arm is
  # too short; shingle/containment + horizon window (round-10 verdict
  # item 5): cap-bounded pair volume is exactly where 30x memory matters;
  # estimator-audit family (round-11 verdict item 4): the close run's
  # cost table tops out on these and their sampling/banding stages had
  # never run above 10x
  Q30=q240_converged_paths,q252_hits,q456_ppr2,q285_ktruss,q347_star_components,q113_pagerank
  Q30=$Q30,q26_ngram_jaccard,q162_containment,q362_winnow_overlap,q53_winnow,q27_minhash_lsh,q465_horizon_dedup
  Q30=$Q30,q442_minhash_est_error,q450_scurve_empirical,q472_bbit_minhash,q434_dedup_transitivity,q422_dedup_sweep
  SPARK_GRAFT_SF_DIR=tmp/scale30 SPARK_GRAFT_BENCH_OUT="$OUT/g30.json" \
    SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench $Q30" || exit 1
  python3 dev/scale_diff.py --tier 30 "$OUT/g30.json" || true
else
  echo "(tmp/scale30 missing - generate with: sbt \"runMain graft.ScaleBench $SF001 tmp/scale30 30\")"
fi

echo "== close chain green (remember: fold budgets only after isolation re-checks; commit everything) =="
