#!/usr/bin/env bash
# Standing sf1 regression gate (round-15 verdict item 1): rebuild the
# deterministic sf1 fixture, oracle-verify EVERY query key against
# DuckDB at 10x the driver's gate scale, and bench the full inventory —
# one command, so every future round refreshes the committed
# CORRECTNESS_sf1.json / BENCH_sf1.json instead of re-deriving the
# round-14 scale proof by hand.
#
# Usage: tools/scale_gate.sh [--skip-bench]
#   produces/overwrites, at the repo root:
#     CORRECTNESS_sf1.json  (check.py --json, driver-shaped)
#     BENCH_sf1.json        (graft.Bench at SPARK_GRAFT_SF_DIR=sf1)
#
# q_dedup_cluster_full's oracle runs in check.py's --big mode: the
# committed oracle's own heavy prefix verbatim, with the recursive-CTE
# connected components swapped for an iterative fixpoint (the recursive
# form exceeds sandbox memory at sf1 — see check.py docstring).
set -euo pipefail
cd "$(dirname "$0")/.."

SF1=${SF1_DIR:-/tmp/testdata/sf1}
OUT=${VERIFY_OUT:-/tmp/verify_sf1}

if [ ! -f "$SF1/lineitem.parquet" ]; then
  echo "== building sf1 fixture at $SF1 (deterministic, from sf0.1) =="
  python tools/make_sf.py /root/testdata/sf0.1 "$SF1" 10
else
  echo "== sf1 fixture present at $SF1 =="
fi

echo "== Verify: dumping all query results at sf1 =="
sbt -batch "runMain graft.Verify $SF1 $OUT"

echo "== check.py: DuckDB oracle compare at sf1 (--big) =="
python tools/check.py "$OUT" "$SF1" --big --json CORRECTNESS_sf1.json

if [ "${1:-}" != "--skip-bench" ]; then
  echo "== Bench at sf1 =="
  # sf-scoped bands (seeded from the last committed clean sf1 artifact
  # via seed_bands.py): give sub-second keys the same min-level noise
  # suppression the sf0.1 bands give, instead of band-less
  # rep-disagreement roulette on a noisy box
  # ${arr[@]+...} guards the empty-array case: under `set -u` on
  # bash < 4.4 an empty "${BAND_ARGS[@]}" is an 'unbound variable'
  # error (the first-ever sf1 seeding run has no band file yet).
  BAND_ARGS=()
  [ -f BENCH_BANDS_sf1.json ] && BAND_ARGS=(SPARK_GRAFT_BENCH_BAND=BENCH_BANDS_sf1.json)
  # SPARK_GRAFT_BENCH_OUT routes the artifact straight to BENCH_sf1.json:
  # gate runs never touch BENCH_LAST.json (the sf0.1 clean capture), and
  # the artifact no longer depends on stdout-tail capture surviving.
  env ${BAND_ARGS[@]+"${BAND_ARGS[@]}"} SPARK_GRAFT_SF_DIR="$SF1" \
    SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json sbt -batch "runMain graft.Bench" \
    | tee /tmp/bench_sf1_run.log
  python - <<'PY'
import json
d = json.load(open("BENCH_sf1.json"))
print(f"sf1 bench: {d['value']:.1f}s, contaminated={d.get('contaminated')}, "
      f"retimed={d.get('retimed')}, preflight_failed={d.get('preflight_failed')}")
PY
fi
echo "== scale gate done =="
