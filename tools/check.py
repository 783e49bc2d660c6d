#!/usr/bin/env python
"""Dev-only self-check mirroring the driver's t2 correctness gate.

NOT part of the engine (the Scala library has zero Python deps) — this
script just lets the builder run the same DuckDB-oracle comparison the
driver runs, before committing.

Usage: python tools/check.py <verify_out_dir> <sf_dir> [query ...]
  <verify_out_dir> must contain <name>/ parquet dirs + oracle_sql.json
  (produced by `sbt "runMain graft.Verify <sf_dir> <verify_out_dir>"`).
"""
import glob
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    # heavy oracles (LSH pair joins at sf1) need a bounded memory
    # footprint with disk spill, or the in-memory default climbs to
    # the sandbox ceiling and the box swaps/OOMs
    con.execute("SET memory_limit='48GB'")
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pq.read_table(files)
        try:
            exp = con.execute(sql).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        g_cols, e_cols = sorted(got.column_names), sorted(exp.column_names)
        if g_cols != e_cols:
            print(f"FAIL {name}: columns {g_cols} vs {e_cols}")
            n_fail += 1
            continue
        got, exp = got.select(g_cols), exp.select(e_cols)
        g_rows = [tuple(norm(v) for v in r) for r in zip(*(c.to_pylist() for c in got.columns))] if got.num_rows else []
        e_rows = [tuple(norm(v) for v in r) for r in zip(*(c.to_pylist() for c in exp.columns))] if exp.num_rows else []
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
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
