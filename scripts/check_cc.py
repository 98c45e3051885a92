#!/usr/bin/env python3
"""Independent connected-components check for x21/x23 (driver-side
tooling, like check_oracle.py).

The DuckDB oracle for x21/x23 closes the cluster transitively with a
recursive CTE that materializes every (vertex, reachable-label) pair —
Sum(component_size^2) rows. At sf0.01 (136-doc dup graph) that is
instant; at sf1 the largest component is ~23k nodes, so the CTE needs
~518M label pairs and runs for hours. That cost is the ORACLE
FORMULATION, not the engine (the engine's size-routed union-find /
label-propagation is the scale-safe shape being verified).

This script is the scale-regime oracle: plain union-find over the pair
list, compared exactly against the engine's x21 clusters and x23
survivorship statuses.

The edge list is taken from the engine's x13 output parquet, which
must itself be hash-verified against the DuckDB x13 oracle first
(check_oracle.py) — x21's input verified, then its closure verified
independently here.

Usage: check_cc.py <sfDir> <verifyOut>
"""
import glob
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def read_output(out_dir, name):
    """All part-files of one Verify output dir (coalesce(1) writes one
    today, but a multi-part output must not silently drop rows), with a
    clear failure when the directory is missing or empty."""
    files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        sys.exit(f"FAIL {name}: no parquet files under {out_dir}/{name}")
    return pa.concat_tables(pq.read_table(f) for f in files)


def main(sf_dir, out_dir):
    pairs = read_output(out_dir, "x13_simhashpairs")
    d1 = pairs.column("d1").to_pylist()
    d2 = pairs.column("d2").to_pylist()

    parent = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(d1, d2):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nodes = set(d1) | set(d2)
    cluster = {v: find(v) for v in nodes}

    failures = 0

    x21 = read_output(out_dir, "x21_dupclusters")
    got = {r["doc_id"]: (r["cluster_id"], r["is_rep"]) for r in x21.to_pylist()}
    want = {v: (c, v == c) for v, c in cluster.items()}
    bad21 = sum(1 for k in want if got.get(k) != want[k]) + \
        sum(1 for k in got if k not in want)
    status = "ok  " if bad21 == 0 else "FAIL"
    if bad21:
        failures += 1
    print(f"{status} x21_dupclusters (union-find: {len(got)} rows, "
          f"{bad21} mismatches)")

    con = duckdb.connect()
    hashrank = con.execute(
        "SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY md5(text) "
        f"ORDER BY doc_id) FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    x23 = read_output(out_dir, "x23_dedup_survivors")
    got23 = {r["doc_id"]: r["status"] for r in x23.to_pylist()}
    bad23 = 0
    for doc, rank in hashrank:
        if rank > 1:
            w = "exact_dup"
        elif doc in cluster and cluster[doc] != doc:
            w = "near_dup_member"
        else:
            w = "kept"
        if got23.get(doc) != w:
            bad23 += 1
    status = "ok  " if bad23 == 0 else "FAIL"
    if bad23:
        failures += 1
    print(f"{status} x23_dedup_survivors (union-find: {len(got23)} rows, "
          f"{bad23} mismatches)")

    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
