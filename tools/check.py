#!/usr/bin/env python
"""Dev-only self-check mirroring the driver's t2 correctness gate.

NOT part of the engine (the Scala library has zero Python deps) — this
script just lets the builder run the same DuckDB-oracle comparison the
driver runs, before committing.

Usage: python tools/check.py <verify_out_dir> <sf_dir> [options] [query ...]
  <verify_out_dir> must contain <name>/ parquet dirs + oracle_sql.json
  (produced by `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"`).
Options:
  --json <path>  also write a driver-shaped correctness artifact
                 ({name: {rows_match, schema_match, hash_match,
                 spark_rows, oracle_rows, err}}) — what the standing
                 sf1 regression gate commits as CORRECTNESS_sf1.json.
  --pagerank-py  check q_graph_pagerank against the independent numpy
                 replay instead of the DuckDB WITH-chain — for
                 fixtures (sf10+) where the SQL oracle's inlined
                 supersteps exhaust spill disk.
  --big          big-fixture mode (sf >= ~1): q_dedup_cluster_full's
                 recursive-CTE connected components is decomposed into
                 an iterative fixpoint loop over temp tables (same
                 algebra — the heavy prefix is taken VERBATIM from the
                 committed oracle text; only the `reach` recursion is
                 replaced by min-label propagation, which computes the
                 identical min-reachable-id per node). The recursive
                 form materializes the full reachability relation and
                 exceeds sandbox memory at sf1; the loop is
                 O(nodes × diameter). Cross-checked against the
                 recursive oracle at the driver's own sf0.01 gate.
"""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

# The suffix of the committed q_dedup_cluster_full oracle that --big
# swaps for the fixpoint loop (everything BEFORE it — tokenization,
# MinHash, banding, Jaccard verify, edges — runs verbatim).
CC_TAIL = ",\nreach(id, comp) AS (\n"


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def duck_mem_limit():
    """Bounded-memory cap for the heavy oracles: never RAISE DuckDB's
    default (80% of physical RAM) — on a small box a hardcoded 48GB
    would take the cap ABOVE physical memory. min(48GB, 60% of RAM)."""
    try:
        total_gb = (os.sysconf("SC_PAGE_SIZE") *
                    os.sysconf("SC_PHYS_PAGES")) / (1 << 30)
    except (ValueError, OSError):
        total_gb = 16.0
    return f"{max(1, min(48, int(total_gb * 0.6)))}GB"


def run_cc_iterative(con, sql):
    """q_dedup_cluster_full at big sf: run the oracle's own prefix (up
    to and including the `edges` CTE), then replace the recursive
    `reach` CTE with min-label propagation to a fixpoint — the same
    min-reachable-id-per-node result, without materializing the full
    reachability relation."""
    head, _ = sql.split(CC_TAIL, 1)  # raises if the oracle text drifts
    con.execute("DROP TABLE IF EXISTS cc_edges")
    con.execute("DROP TABLE IF EXISTS cc_comp")
    # Symmetrize ONCE at creation (edge-orientation-proof even if the
    # oracle ever emits only a<b pairs) — a DISTINCT here is a no-op
    # on today's already-symmetric edges CTE, and the fixpoint below
    # then needs only ONE join direction per iteration instead of two.
    con.execute("CREATE TEMP TABLE cc_edges AS " + head +
                "\nSELECT DISTINCT a, b FROM ("
                "SELECT a, b FROM edges UNION ALL "
                "SELECT b AS a, a AS b FROM edges)")
    con.execute("CREATE TEMP TABLE cc_comp AS "
                "SELECT doc_id AS id, doc_id AS comp FROM documents")
    while True:
        con.execute(
            "CREATE TEMP TABLE cc_next AS "
            "SELECT id, min(comp) AS comp FROM ("
            "  SELECT id, comp FROM cc_comp"
            "  UNION ALL"
            # one direction suffices: cc_edges is symmetrized at
            # creation above
            "  SELECT e.a AS id, c.comp FROM cc_edges e"
            "  JOIN cc_comp c ON c.id = e.b"
            ") GROUP BY id")
        changed = con.execute(
            "SELECT count(*) FROM cc_next n JOIN cc_comp c USING (id) "
            "WHERE n.comp <> c.comp").fetchone()[0]
        con.execute("DROP TABLE cc_comp")
        con.execute("ALTER TABLE cc_next RENAME TO cc_comp")
        if changed == 0:
            break
    return con.execute(
        "SELECT id AS doc_id, CAST(comp AS BIGINT) AS cluster "
        "FROM cc_comp ORDER BY doc_id").arrow()


def sample_keeps(canonical, seed, frac):
    """Independent Python reimplementation of the connector's pushed
    table-sample membership (FNV-1a seeded per query + splitmix64
    finalizer, top 53 bits -> u in [0,1), keep iff u < frac) over the
    store's canonical key encoding. Mirrors the ScalaTest law in
    DynamoConnectorSpec so q_dyn_sample gets a CONTENT-EXACT check in
    the correctness artifact even though DuckDB cannot express it."""
    m = (1 << 64) - 1
    h = (seed ^ 0xcbf29ce484222325) & m
    for b in canonical.encode("utf-8"):
        h = ((h ^ b) * 0x100000001b3) & m
    h ^= h >> 30
    h = (h * 0xbf58476d1ce4e5b9) & m
    h ^= h >> 27
    h = (h * 0x94d049bb133111eb) & m
    h ^= h >> 31
    return (h >> 11) / float(1 << 53) < frac


def pagerank_oracle(con):
    """Independent numpy replay of q_graph_pagerank for fixtures where
    the DuckDB WITH-chain oracle is infeasible (the sf10 probe: the 3
    inlined supersteps re-derive the distinct-pairs join per round and
    exhausted spill disk). Only the distinct cust-supp pair derivation
    runs in DuckDB; the supersteps replay the engine's exact
    arithmetic — float64 division + floor for the per-edge share
    (Spark's `floor(rank / d)` divides BIGINTs as DOUBLE, which can
    differ from integer division near quotient boundaries), exact
    integer share sums (every addend and partial sum < 2^53, so the
    float64 bincount is exact), then the engine's own double chain
    `150000 + floor(850000.0 * sum / 1000000.0)` in the same
    multiply-then-divide order. Cross-checked against the SQL oracle
    at sf0.1/sf1 (--pagerank-py vs default must agree)."""
    import numpy as np
    import pyarrow as pa
    pairs = con.execute(
        "SELECT DISTINCT CAST(o_custkey AS BIGINT) AS cust, "
        "CAST(l_suppkey AS BIGINT) AS supp "
        "FROM orders JOIN lineitem ON o_orderkey = l_orderkey").arrow()
    cust = pairs.column("cust").to_numpy()
    supp = pairs.column("supp").to_numpy() + 1000000
    src = np.concatenate([cust, supp])
    dst = np.concatenate([supp, cust])
    nodes, src_i = np.unique(src, return_inverse=True)
    dst_i = np.searchsorted(nodes, dst)  # symmetric edges: same node set
    n = len(nodes)
    deg = np.bincount(src_i, minlength=n).astype(np.float64)
    rank = np.full(n, 1000000, dtype=np.int64)
    for _ in range(3):
        share = np.floor(rank.astype(np.float64)[src_i] / deg[src_i])
        s = np.bincount(dst_i, weights=share, minlength=n)
        rank = (150000 +
                np.floor(850000.0 * s / 1000000.0)).astype(np.int64)
    top = np.lexsort((nodes, -rank))[:25]
    return pa.table({"node": pa.array(nodes[top], type=pa.int64()),
                     "rank": pa.array(rank[top], type=pa.int64())})


def dyn_sample_oracle(con):
    """Content-exact expected rows for q_dyn_sample: the customer
    fixture filtered by the seeded-hash membership over the canonical
    numeric key encoding ("n:<custkey>"), projected and ordered like
    the query (seed 1234, fraction 0.3). The Spark side is read by the
    main compare loop like any other key."""
    full = con.execute(
        "SELECT c_custkey, c_name, c_acctbal FROM customer "
        "ORDER BY c_custkey").arrow()
    keep = [sample_keeps(f"n:{k}", 1234, 0.3)
            for k in full.column("c_custkey").to_pylist()]
    return full.filter(keep)


def main():
    args = [a for a in sys.argv[1:]]
    json_out = None
    big = False
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i:i + 2]
    if "--big" in args:
        big = True
        args.remove("--big")
    pagerank_py = False
    if "--pagerank-py" in args:
        pagerank_py = True
        args.remove("--pagerank-py")
    out_dir, sf_dir = args[0], args[1]
    only = set(args[2:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # heavy oracles (LSH pair joins at sf1) need a bounded memory
    # footprint with disk spill, or the in-memory default climbs to
    # the sandbox ceiling and the box swaps/OOMs
    con.execute(f"SET memory_limit='{duck_mem_limit()}'")
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    report = {}
    # q_dyn_sample has no SQL oracle (DuckDB can't express the seeded
    # key-hash) but IS content-exact-checkable in Python — give it a
    # synthetic entry so the artifact carries a real verdict for it
    items = sorted(oracle.items())
    if "q_dyn_sample" not in oracle and glob.glob(
            os.path.join(out_dir, "q_dyn_sample", "*.parquet")):
        items.append(("q_dyn_sample", None))
    for name, sql in items:
        if only and name not in only:
            continue
        entry = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": None,
                 "oracle_rows": None, "err": None}
        report[name] = entry
        files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output")
            entry["err"] = "no_spark_output"
            n_fail += 1
            continue
        got = pq.read_table(files)
        entry["spark_rows"] = got.num_rows
        try:
            if sql is None:  # q_dyn_sample: python hash-membership oracle
                exp = dyn_sample_oracle(con)
                entry["check"] = "python_hash_membership"
            elif name == "q_dyn_sample":
                # the committed SQL oracle (HUGEINT limb arithmetic)
                # AND the independent Python reimplementation must
                # agree before either verdict is trusted
                exp = con.execute(sql).arrow()
                pyexp = dyn_sample_oracle(con)
                if (sorted(exp.column_names) != sorted(pyexp.column_names)
                        or exp.select(sorted(exp.column_names)).to_pylist()
                        != pyexp.select(sorted(pyexp.column_names)).to_pylist()):
                    raise RuntimeError(
                        "q_dyn_sample: DuckDB SQL oracle and Python "
                        "hash membership disagree")
                entry["check"] = "duckdb_sql+python_cross"
            elif pagerank_py and name == "q_graph_pagerank":
                exp = pagerank_oracle(con)
                entry["check"] = "python_numpy_replay"
            elif big and name == "q_dedup_cluster_full":
                exp = run_cc_iterative(con, sql)
            else:
                exp = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            entry["err"] = f"oracle_error: {e}"
            n_fail += 1
            continue
        entry["oracle_rows"] = exp.num_rows
        g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
        entry["rows_match"] = got.num_rows == exp.num_rows
        entry["schema_match"] = g_cols == e_cols
        if g_cols != e_cols:
            print(f"FAIL {name}: columns {g_cols} vs {e_cols}")
            entry["hash_match"] = False
            n_fail += 1
            continue
        got, exp = got.select(g_cols), exp.select(e_cols)
        g_rows = [tuple(norm(v) for v in r) for r in zip(*(c.to_pylist() for c in got.columns))] if got.num_rows else []
        e_rows = [tuple(norm(v) for v in r) for r in zip(*(c.to_pylist() for c in exp.columns))] if exp.num_rows else []
        entry["hash_match"] = g_rows == e_rows
        if g_rows == e_rows:
            print(f"PASS {name} ({len(g_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows {len(g_rows)} vs {len(e_rows)}")
            for i, (a, b) in enumerate(zip(g_rows, e_rows)):
                if a != b:
                    print(f"  first diff at row {i}:\n    spark={a}\n    duck ={b}")
                    break
            else:
                if len(g_rows) != len(e_rows):
                    k = min(len(g_rows), len(e_rows))
                    print(f"  extra rows from row {k}: "
                          f"{(g_rows[k:k+2] or e_rows[k:k+2])}")
            # schema hint
            print(f"  spark schema: {[(f.name, str(f.type)) for f in got.schema]}")
            print(f"  duck  schema: {[(f.name, str(f.type)) for f in exp.schema]}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
