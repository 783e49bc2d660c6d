#!/usr/bin/env bash
# Standing sf3 probe (round-16 verdict item 1): the r15 graph-scale
# result — supersteps pass at the ORIGINAL 8 GB heap + stock 32
# partitions — lived in a commit message; a plan regression
# re-introducing the stock-width window shuffle would only surface when
# someone re-ran the manual BenchSeq recipe. This script IS that
# recipe, pinned: rebuild the deterministic sf3 fixture (30× base),
# run the heaviest/representative keys through graft.BenchSeq at the
# EXPLICIT 8 GB / 32-thread / 32-partition session, and write
# BENCH_sf3probe.json at the repo root for commit.
#
# Usage: tools/sf3_probe.sh
#
# Expected shape (r15 baselines, min-of-2): pagerank 27-30 s,
# communities ~16 s, winnow/despan/contaminate 27-41 s,
# semantic_lsh ~6 s; graph keys >1.5× these = regression.
set -euo pipefail
cd "$(dirname "$0")/.."

SF1=${SF1_DIR:-/tmp/testdata/sf1}
SF3=${SF3_DIR:-/tmp/testdata/sf3}

if [ ! -f "$SF1/lineitem.parquet" ]; then
  echo "== building sf1 fixture at $SF1 (deterministic, from sf0.1) =="
  python tools/make_sf.py /root/testdata/sf0.1 "$SF1" 10
fi
if [ ! -f "$SF3/lineitem.parquet" ]; then
  echo "== building sf3 fixture at $SF3 (deterministic, from sf1) =="
  python tools/make_sf.py "$SF1" "$SF3" 3
else
  echo "== sf3 fixture present at $SF3 =="
fi

# The 15 heaviest/representative keys from the r15 probe table, plus
# the LSH scale path. q_dedup_semantic (the documented fixed-k
# quadratic, 61 s at sf3) is deliberately ABSENT — its contract is
# named in SURVEY and its scale path (q_dedup_semantic_lsh) is probed.
KEYS=(
  q_text_winnow q_text_despan q_dedup_winnow q_text_contaminate
  q_agg_percentile q_dedup_cluster_full
  q_graph_pagerank q_graph_communities
  q_sim_ivf_pq q_dedup_semantic_lsh
  q_dedup_minhash q_dedup_near q_sql_tpch_q1
  q_topk_group q_agg_group q_scan_filter
)

echo "== BenchSeq at sf3 (pinned 8 GB heap, 32 threads, 32 partitions) =="
env SPARK_DRIVER_MEM=8g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR="$SF3" \
  SPARK_GRAFT_BENCH_OUT=BENCH_sf3probe.json \
  sbt -batch "runMain graft.BenchSeq ${KEYS[*]}" | tee /tmp/sf3_probe_run.log

python - <<'PY'
import json
d = json.load(open("BENCH_sf3probe.json"))
q = d["queries"]
print(f"sf3 probe: {d['value']:.1f}s over {len(q)} keys; "
      f"pagerank={q.get('q_graph_pagerank')}s "
      f"communities={q.get('q_graph_communities')}s")
PY
echo "== sf3 probe done =="
