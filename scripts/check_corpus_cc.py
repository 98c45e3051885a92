#!/usr/bin/env python3
"""Independent union-find over the COLLAPSED x21 edge list (the exact
frame dupClusters ran CC over, dumped by corpus_cc_dump.scala) compared
label-for-label against the engine's x21 output, plus the collapse
invariant: documents with identical fingerprints share a cluster.

This is the 500k-corpus leg of the x21 verification: the full-pair-list
check (check_cc.py) runs at sf1 where the x13 pair list is tractable and
verifies the COLLAPSE is component-preserving; this script verifies the
CC KERNEL against those edges at the scale where full pairs are the
quadratic object itself.

Usage: check_corpus_cc.py <ccDumpDir>
"""
import glob
import sys

import pyarrow as pa
import pyarrow.parquet as pq


def read_output(out_dir, name):
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        sys.exit(f"FAIL {name}: no parquet files under {out_dir}/{name}")
    return pa.concat_tables(pq.read_table(f) for f in files)


def main(dump_dir):
    edges = read_output(dump_dir, "x21_edges")
    labels = read_output(dump_dir, "x21_dupclusters")

    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for s, d in zip(edges.column("s").to_pylist(),
                    edges.column("d").to_pylist()):
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
    comp_min = {}
    for v in parent:
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expect = {v: comp_min[find(v)] for v in parent}

    got = dict(zip(labels.column("doc_id").to_pylist(),
                   labels.column("cluster_id").to_pylist()))
    if set(got) != set(expect):
        sys.exit(f"FAIL x21: vertex sets differ "
                 f"(engine {len(got)}, union-find {len(expect)})")
    bad = [v for v in expect if got[v] != expect[v]]
    if bad:
        v = bad[0]
        sys.exit(f"FAIL x21: {len(bad)} label mismatches, e.g. doc {v}: "
                 f"engine {got[v]} vs union-find {expect[v]}")
    reps = {r for r, _ in zip(labels.column("doc_id").to_pylist(),
                              labels.column("is_rep").to_pylist()) if _}
    if reps != set(comp_min.values()):
        sys.exit("FAIL x21: is_rep set differs from component minima")
    n_clusters = len(set(expect.values()))
    print(f"ok   x21 ({len(expect)} vertices, {n_clusters} clusters, "
          f"labels exact)")
    sys.exit(0)


if __name__ == "__main__":
    main(sys.argv[1])
