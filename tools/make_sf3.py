#!/usr/bin/env python3
"""Synthesize /tmp/sf0.3 = sf0.1 x3 for scale-growth sweeps (PERF.md
round-14 method, rebuilt as a persistent tool after the original
throwaway script was lost with the container).

Per-copy key offsets keep FKs consistent (offset = max key + 1 of the
base, per key family); region/nation stay single-copy (bounded dims).
Document copies are NON-near-dups by construction: copy 1 reverses the
word order, copy 2 interleaves even/odd positions — same token/char
distributions, disjoint 3-gram shingle sets (a sorted-words variant
made every copy pairwise-similar and inflated the shingle family — see
PERF.md). Embedding copies sign-flip a copy-dependent dim subset
(norms preserved). Events shift ts by +k seconds per copy.

Usage: python3 tools/make_sf3.py [src_dir] [dst_dir]
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.3"


def rd(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def wr(name, tbl):
    pq.write_table(tbl, f"{DST}/{name}.parquet")
    print(f"{name}: {tbl.num_rows} rows")


def off(tbl, col):
    return pc.max(tbl[col]).as_py() + 1


def shift(tbl, copy, offsets):
    cols = []
    for f in tbl.schema:
        c = tbl[f.name]
        if f.name in offsets:
            c = pc.add(c, copy * offsets[f.name])
        cols.append(c)
    return pa.Table.from_arrays(cols, names=tbl.schema.names)


def triple(name, offsets, extra=None):
    base = rd(name)
    parts = [base]
    for k in (1, 2):
        t = shift(base, k, offsets)
        if extra is not None:
            t = extra(t, k)
        parts.append(t)
    wr(name, pa.concat_tables(parts))


def main():
    import os
    os.makedirs(DST, exist_ok=True)
    # bounded dims: single copy
    for name in ("region", "nation"):
        wr(name, rd(name))

    cust = rd("customer")
    supp = rd("supplier")
    part = rd("part")
    orders = rd("orders")
    docs = rd("documents")
    emb = rd("embeddings")
    events = rd("events")
    o_c = off(cust, "c_custkey")
    o_s = off(supp, "s_suppkey")
    o_p = off(part, "p_partkey")
    o_o = off(orders, "o_orderkey")
    o_d = off(docs, "doc_id")
    o_v = off(emb, "vec_id")
    o_e = off(events, "event_id")
    o_u = off(events, "user_id")

    triple("customer", {"c_custkey": o_c})
    triple("supplier", {"s_suppkey": o_s})
    triple("part", {"p_partkey": o_p})
    triple("orders", {"o_orderkey": o_o, "o_custkey": o_c})
    triple("lineitem", {"l_orderkey": o_o, "l_partkey": o_p,
                        "l_suppkey": o_s})

    def ev_extra(t, k):
        ts = pc.add(t["ts"], pa.scalar(k * 1_000_000, pa.duration("us")))
        return t.set_column(t.schema.get_field_index("ts"), "ts", ts)
    triple("events", {"event_id": o_e, "user_id": o_u}, ev_extra)

    def doc_extra(t, k):
        texts = t["text"].to_pylist()
        out = []
        for s in texts:
            w = s.split(" ")
            if k == 1:
                w = w[::-1]
            else:
                w = w[0::2] + w[1::2]
            out.append(" ".join(w))
        t = t.set_column(t.schema.get_field_index("text"), "text",
                         pa.array(out, pa.string()))
        n = pa.array([len(s) for s in out], pa.int64())
        return t.set_column(t.schema.get_field_index("n_chars"), "n_chars", n)
    triple("documents", {"doc_id": o_d}, doc_extra)

    def emb_extra(t, k):
        out = []
        for v in t["embedding"].to_pylist():
            # copy-dependent dim subset: flip sign where (dim + k) % 3 == 0
            out.append([-x if (d + k) % 3 == 0 else x
                        for d, x in enumerate(v)])
        t = t.set_column(t.schema.get_field_index("embedding"), "embedding",
                         pa.array(out, pa.list_(pa.float32())))
        return t
    triple("embeddings", {"vec_id": o_v}, emb_extra)


if __name__ == "__main__":
    main()
