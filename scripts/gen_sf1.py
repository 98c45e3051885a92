#!/usr/bin/env python3
"""Generate a ~10x sf1 star schema under tmp/sf1 from /root/testdata/sf0.1
by key-shifted replication (driver-side tooling, like check_oracle.py).

- Fact/dim keys are offset per copy so FK joins keep their fan-out
  (copy k of orders joins copy k of customer, etc.).
- region/nation stay fixed (true dimension tables).
- documents: per-copy deterministic token shuffle, so copies are NOT
  near-duplicates of each other and pair-producing queries (x05/x07/
  x13) scale ~linearly instead of inheriting 45 pairs per 10-dup group.
- embeddings: per-copy cyclic rotation (random vectors decorrelate
  under rotation) for the same reason on x09.

Usage: gen_sf1.py [src_dir out_dir copies [tables]]

`tables` (comma-separated, optional) restricts generation — e.g.
`documents,embeddings` builds just the text/vector corpus for the
round-8 500k-doc soak without writing a 60M-row lineitem nobody reads.
"""
import random
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/tmp/sf1"
COPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
WANT = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None


def want(name):
    return WANT is None or name in WANT


def load(name):
    return pq.read_table(f"{SRC}/{name}.parquet")


def save(name, tbl):
    pq.write_table(tbl, f"{OUT}/{name}.parquet")
    print(f"{name}: {tbl.num_rows} rows")


def shifted(tbl, offsets, i):
    """Copy i of tbl with each key column shifted by i*span (span =
    max key + 1: keys are 0-based, so max alone would make copy i's top
    key collide with copy i+1's bottom key)."""
    cols = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        if name in offsets:
            col = pc.add(col, pa.scalar(i * offsets[name], type=col.type))
        cols[name] = col
    return pa.table(cols, schema=tbl.schema)


def replicate(name, key_cols):
    if not want(name):
        return
    tbl = load(name)
    offsets = {c: pc.max(tbl.column(c)).as_py() + 1 for c in key_cols}
    save(name, pa.concat_tables(
        shifted(tbl, offsets, i) for i in range(COPIES)))


import os
os.makedirs(OUT, exist_ok=True)

for name in ("region", "nation"):
    if want(name):
        save(name, load(name))

replicate("customer", ["c_custkey"])
replicate("supplier", ["s_suppkey"])
replicate("part", ["p_partkey"])

if want("orders"):
    span_cust = pc.max(load("customer").column("c_custkey")).as_py() + 1
    span_order = pc.max(load("orders").column("o_orderkey")).as_py() + 1
    orders = load("orders")
    save("orders", pa.concat_tables(
        shifted(orders, {"o_orderkey": span_order, "o_custkey": span_cust}, i)
        for i in range(COPIES)))

if want("lineitem"):
    span_order = pc.max(load("orders").column("o_orderkey")).as_py() + 1
    span_part = pc.max(load("part").column("p_partkey")).as_py() + 1
    span_supp = pc.max(load("supplier").column("s_suppkey")).as_py() + 1
    lineitem = load("lineitem")
    save("lineitem", pa.concat_tables(
        shifted(lineitem,
                {"l_orderkey": span_order, "l_partkey": span_part,
                 "l_suppkey": span_supp}, i)
        for i in range(COPIES)))

replicate("events", ["event_id", "user_id"])

if want("documents"):
    docs = load("documents")
    parts = []
    for i in range(COPIES):
        t = shifted(docs, {"doc_id": pc.max(docs.column("doc_id")).as_py() + 1}, i)
        if i > 0:
            rng = random.Random(1000 + i)
            texts = []
            for s in t.column("text").to_pylist():
                toks = s.split(" ")
                rng.shuffle(toks)
                texts.append(" ".join(toks))
            t = t.set_column(t.column_names.index("text"), "text",
                             pa.array(texts, type=pa.string()))
        parts.append(t)
    save("documents", pa.concat_tables(parts))

if want("embeddings"):
    emb = load("embeddings")
    parts = []
    dim = len(emb.column("embedding")[0])
    for i in range(COPIES):
        t = shifted(emb, {"vec_id": pc.max(emb.column("vec_id")).as_py() + 1}, i)
        if i > 0:
            rot = (7 * i) % dim
            # rotations alone cycle with period dim (gcd(7, dim)=1):
            # copy dim is copy 0 again. Past one full rotation block,
            # overlay a deterministic per-block sign flip (norms
            # preserved, random-vector correlation ~0) so e.g. a
            # 500-copy 1M-vector ANN soak has no exact-duplicate
            # copies. Blocks < 1 (i < dim) keep the historical output
            # byte-identical (sf1/sf10 soak fixtures reproduce).
            blk = i // dim
            signs = None
            if blk:
                rnd = random.Random(1234 + blk)
                signs = [1.0 if rnd.random() < 0.5 else -1.0
                         for _ in range(dim)]
            vecs = [v[rot:] + v[:rot] for v in t.column("embedding").to_pylist()]
            if signs:
                vecs = [[x * s for x, s in zip(v, signs)] for v in vecs]
            t = t.set_column(t.column_names.index("embedding"), "embedding",
                             pa.array(vecs, type=emb.schema.field("embedding").type))
        parts.append(t)
    save("embeddings", pa.concat_tables(parts))
