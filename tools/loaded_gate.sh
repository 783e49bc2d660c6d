#!/usr/bin/env bash
# Loaded full-suite gate: run the whole ScalaTest suite N times in a
# /tmp clone (own sbt lock) under a busy-loop CPU hog, recording each
# run's verdict. The r16/r17 deflake standard: 3 consecutive green
# runs under load. Usage: tools/loaded_gate.sh [runs] [hog_workers]
set -u
RUNS="${1:-3}"
HOGS="${2:-20}"
SRC="$(cd "$(dirname "$0")/.." && pwd)"
WORK=/tmp/graft-loaded-gate
OUT="$WORK/results.txt"
rm -rf "$WORK"; mkdir -p "$WORK"
git -C "$SRC" rev-parse HEAD > "$WORK/head.txt"
# clone working tree at HEAD (committed state only)
git clone -q "$SRC" "$WORK/repo"
cd "$WORK/repo"
# CPU hog: pure busy loops, killed on exit
for i in $(seq 1 "$HOGS"); do
  (while :; do :; done) &
  echo $! >> "$WORK/hogs.pid"
done
trap 'xargs -r kill < "$WORK/hogs.pid" 2>/dev/null' EXIT
: > "$OUT"
for r in $(seq 1 "$RUNS"); do
  t0=$(date +%s)
  if sbt -batch test > "$WORK/run$r.log" 2>&1; then v=GREEN; else v=RED; fi
  t1=$(date +%s)
  n=$(grep -oE 'Tests: succeeded [0-9]+, failed [0-9]+' "$WORK/run$r.log" | tail -1)
  echo "run$r: $v ($((t1-t0))s) $n" | tee -a "$OUT"
  if [ "$v" = RED ]; then
    grep -B2 -A8 'FAILED\|\*\*\*' "$WORK/run$r.log" | head -60 >> "$OUT"
  fi
done
echo "head: $(cat "$WORK/head.txt")" >> "$OUT"
