#!/usr/bin/env python
"""Deterministic fixture scaler: build sfN from sf(N/factor).

Dev/judge tooling only (the Scala library has zero Python deps) — this
exists so scale claims can be PROVEN with data instead of plan reading:
`python tools/make_sf.py /root/testdata/sf0.1 /tmp/testdata/sf1 10`
produces a 10x key-space-extended copy of every fixture table, and the
normal Verify + check.py + Bench pipeline runs against it unchanged.

Recipe (seed-free, fully deterministic given the source):
  * region/nation are dimensions — copied as-is.
  * Every other table is replicated `factor` times; copy k=0 is the
    byte-identical source, copies k>0 remap every key column by
    +k*N_owner where N_owner is the OWNER table's source row count
    (keys are dense 0..N-1 in the driver fixtures), so referential
    integrity (lineitem->orders/part/supplier, orders->customer,
    events->user space) holds at every factor.
  * Entity names that embed the key (Customer#%09d / Supplier#%09d)
    are regenerated from the remapped key so name<->key stays a
    bijection at scale.
  * Monetary/value doubles get +k*0.01 so replicas are not exact
    value-ties of the source rows (ORDER BY determinism at scale).
  * documents.text for k>0 is a word-shuffle of the source text
    (random.Random(new_doc_id) — deterministic), so the scaled corpus
    is 10x DISTINCT documents (same token/length distribution), not
    10 exact copies of each — otherwise every dedup family would see
    bucket sizes scale by factor (pairs by factor^2), which is a skew
    shape, not a scale-up. n_chars is recomputed from the new text.
  * embeddings.embedding for k>0 is the source vector rotated by k
    positions (same norm, new direction); vec_id remapped.
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ROW_GROUP = 131072


def read(src, t):
    return pq.read_table(os.path.join(src, t + ".parquet"))


def write(dst, t, tbl):
    pq.write_table(tbl, os.path.join(dst, t + ".parquet"),
                   row_group_size=ROW_GROUP)
    print(f"  {t}: {tbl.num_rows} rows")


def shift(tbl, col, delta):
    i = tbl.column_names.index(col)
    return tbl.set_column(i, col, pc.add(tbl.column(col), delta))


def scaled(tbl, factor, keyshifts, valuecols=(), percopy=None):
    """keyshifts: {col: owner_rowcount}; valuecols get +k*0.01;
    percopy(k, tbl) -> tbl for custom per-copy transforms."""
    copies = []
    for k in range(factor):
        t = tbl
        if k > 0:
            for col, base in keyshifts.items():
                t = shift(t, col, k * base)
            for col in valuecols:
                i = t.column_names.index(col)
                t = t.set_column(i, col, pc.add(t.column(col), k * 0.01))
            if percopy is not None:
                t = percopy(k, t)
        copies.append(t)
    return pa.concat_tables(copies)


def main():
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst, exist_ok=True)

    for t in ("region", "nation"):
        write(dst, t, read(src, t))

    customer = read(src, "customer")
    orders = read(src, "orders")
    part = read(src, "part")
    supplier = read(src, "supplier")
    events = read(src, "events")
    documents = read(src, "documents")
    embeddings = read(src, "embeddings")
    lineitem = read(src, "lineitem")

    n_cust, n_ord = customer.num_rows, orders.num_rows
    n_part, n_supp = part.num_rows, supplier.num_rows
    n_evt, n_doc, n_vec = events.num_rows, documents.num_rows, embeddings.num_rows
    n_user = int(pc.max(events.column("user_id")).as_py()) + 1

    def rename(tag, width=9):
        def f(k, t):
            keys = t.column(tag[0]).to_pylist()
            names = [f"{tag[1]}#{x:0{width}d}" for x in keys]
            i = t.column_names.index(tag[2])
            return t.set_column(i, tag[2], pa.array(names, pa.string()))
        return f

    write(dst, "customer", scaled(
        customer, factor, {"c_custkey": n_cust}, ("c_acctbal",),
        rename(("c_custkey", "Customer", "c_name"))))
    write(dst, "supplier", scaled(
        supplier, factor, {"s_suppkey": n_supp}, ("s_acctbal",),
        rename(("s_suppkey", "Supplier", "s_name"))))
    write(dst, "part", scaled(
        part, factor, {"p_partkey": n_part}, ("p_retailprice",)))
    write(dst, "orders", scaled(
        orders, factor, {"o_orderkey": n_ord, "o_custkey": n_cust},
        ("o_totalprice",)))
    write(dst, "lineitem", scaled(
        lineitem, factor,
        {"l_orderkey": n_ord, "l_partkey": n_part, "l_suppkey": n_supp},
        ("l_extendedprice",)))
    write(dst, "events", scaled(
        events, factor, {"event_id": n_evt, "user_id": n_user}, ("value",)))

    def shuffle_text(k, t):
        ids = t.column("doc_id").to_pylist()
        texts = t.column("text").to_pylist()
        out = []
        for did, txt in zip(ids, texts):
            words = txt.split(" ")
            random.Random(did).shuffle(words)
            out.append(" ".join(words))
        ti = t.column_names.index("text")
        t = t.set_column(ti, "text", pa.array(out, pa.string()))
        ci = t.column_names.index("n_chars")
        return t.set_column(
            ci, "n_chars", pa.array([len(s) for s in out], pa.int64()))

    write(dst, "documents", scaled(
        documents, factor, {"doc_id": n_doc}, (), shuffle_text))

    def rotate_vec(k, t):
        vecs = t.column("embedding").to_pylist()
        rot = [v[k % len(v):] + v[:k % len(v)] if v else v for v in vecs]
        i = t.column_names.index("embedding")
        return t.set_column(i, "embedding",
                            pa.array(rot, pa.list_(pa.float32())))

    write(dst, "embeddings", scaled(
        embeddings, factor, {"vec_id": n_vec}, (), rotate_vec))


if __name__ == "__main__":
    main()
