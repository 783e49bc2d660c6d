#!/usr/bin/env bash
# Standing sf10 probe (round-17 verdict item 3): the third scaling
# decade for the heaviest keys. The sf3 probe caught the r14 graph-OOM
# class; sf10 (100x the bench fixture) is where the next cliff class
# would show — driver-side page-directory metadata, checkpoint block
# pressure, heap headroom of the candidate-generation joins. Builds the
# deterministic sf10 fixture (10x sf1), then probes the verdict's top-8
# keys ONE KEY PER JVM at the same pinned 8 GB / 32-thread / 32-partition
# session the sf3 probe uses — per-key isolation so one key's cliff
# cannot erase the artifact for the rest. A key that fails at 8 GB is
# retried once at 16 GB and recorded under "heap_cliff" (the cliff IS
# the finding); a key failing both records "fail". Merged artifact:
# BENCH_sf10probe.json at the repo root for commit.
#
# Usage: tools/sf10_probe.sh
#
# Expected shape from the sf3 probe (30x) scaled ~3.3x if linear:
# winnow ~120 s, despan ~140 s, contaminate ~100 s, pagerank ~95-150 s
# (supersteps grow with |V| log-ish), communities ~50 s,
# cluster_full ~45 s, dedup_winnow ~120 s, semantic_lsh ~20 s.
set -uo pipefail
cd "$(dirname "$0")/.."

SF1=${SF1_DIR:-/tmp/testdata/sf1}
SF10=${SF10_DIR:-/tmp/testdata/sf10}

if [ ! -f "$SF1/lineitem.parquet" ]; then
  echo "== building sf1 fixture at $SF1 (deterministic, from sf0.1) =="
  python tools/make_sf.py /root/testdata/sf0.1 "$SF1" 10 || exit 1
fi
if [ ! -f "$SF10/lineitem.parquet" ]; then
  echo "== building sf10 fixture at $SF10 (deterministic, from sf1) =="
  python tools/make_sf.py "$SF1" "$SF10" 10 || exit 1
else
  echo "== sf10 fixture present at $SF10 =="
fi

# The round-17 verdict's top-8 keys by sf0.1 cost.
KEYS=(
  q_text_despan q_dedup_winnow q_text_winnow q_text_contaminate
  q_graph_pagerank q_graph_communities q_dedup_cluster_full
  q_dedup_semantic_lsh
)

OUTDIR=$(mktemp -d /tmp/sf10probe.XXXX)
for k in "${KEYS[@]}"; do
  echo "== sf10 probe: $k at 8g =="
  if env SPARK_DRIVER_MEM=8g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF10" \
      SPARK_GRAFT_BENCH_OUT="$OUTDIR/$k.json" \
      sbt -batch "runMain graft.BenchSeq $k" > "$OUTDIR/$k.log" 2>&1; then
    echo "   ok: $(cat "$OUTDIR/$k.json")"
  else
    echo "   8g FAILED for $k — retrying at 16g (recording the cliff)"
    if env SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF10" \
        SPARK_GRAFT_BENCH_OUT="$OUTDIR/$k.json" \
        sbt -batch "runMain graft.BenchSeq $k" > "$OUTDIR/$k.16g.log" 2>&1; then
      touch "$OUTDIR/$k.heap_cliff"
      echo "   16g ok: $(cat "$OUTDIR/$k.json")"
    else
      touch "$OUTDIR/$k.fail"
      echo "   16g ALSO FAILED for $k (tail of log):"
      tail -5 "$OUTDIR/$k.16g.log"
    fi
  fi
done

python - "$OUTDIR" "$SF10" <<'PY'
import glob, json, os, sys
outdir, sf10_dir = sys.argv[1], sys.argv[2]
queries, reps, cliffs, fails = {}, {}, [], []
for k in sorted(glob.glob(os.path.join(outdir, "*.json"))):
    name = os.path.basename(k)[:-5]
    d = json.load(open(k))
    queries.update(d["queries"])
    reps.update(d["reps"])
    if os.path.exists(os.path.join(outdir, name + ".heap_cliff")):
        cliffs.append(name)
for f in glob.glob(os.path.join(outdir, "*.fail")):
    fails.append(os.path.basename(f)[:-5])
art = {"metric": "total", "value": round(sum(queries.values()), 3),
       "unit": "sec", "queries": queries, "reps": reps,
       "sf": sf10_dir, "heap_cliff_16g": sorted(cliffs),
       "failed": sorted(fails)}
with open("BENCH_sf10probe.json", "w") as f:
    json.dump(art, f, sort_keys=True)
    f.write("\n")
print(f"sf10 probe: {art['value']:.1f}s over {len(queries)} keys; "
      f"cliffs={cliffs or 'none'} fails={fails or 'none'}")
PY
echo "== sf10 probe done =="
