#!/usr/bin/env python3
"""Scale-regime check for x58 (quality survivorship) — driver-side
tooling, like check_cc.py.

x58's DuckDB oracle shares x21's recursive-CTE closure, which is
infeasible at sf1 (see check_cc.py). At scale the composition is
verified instead from independently-verified parts:

  - cluster labels: the ENGINE's x21 output, itself verified by
    check_cc.py's union-find (run that first);
  - quality: the x10 oracle SQL exactly as dumped in oracle_sql.json
    (DuckDB recomputes every doc's score from the raw table);
  - the keep rank: recomputed here in DuckDB over those two inputs
    (ROW_NUMBER per cluster ORDER BY quality DESC NULLS LAST, doc_id)

and compared row-for-row against the engine's x58 parquet.

Usage: check_x58.py <sfDir> <verifyOut>
"""
import glob
import json
import sys

import duckdb


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    x10 = oracles["x10_quality"]

    def out_glob(name):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            sys.exit(f"FAIL {name}: no parquet under {out_dir}/{name}")
        return f"{out_dir}/{name}/*.parquet"

    con.execute(f"CREATE VIEW lab AS SELECT doc_id, cluster_id "
                f"FROM '{out_glob('x21_dupclusters')}'")
    con.execute(f"CREATE TABLE q AS {x10}")
    expected = con.execute(f"""
        WITH fl AS (SELECT d.doc_id,
                COALESCE(l.cluster_id, d.doc_id) AS cluster_id, q.quality
              FROM documents d
              LEFT JOIN lab l ON l.doc_id = d.doc_id
              JOIN q ON q.doc_id = d.doc_id),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
                ORDER BY quality DESC NULLS LAST, doc_id) AS rk FROM fl)
        SELECT doc_id, cluster_id, quality, rk = 1 AS keep
        FROM r ORDER BY doc_id""").fetchall()
    got = con.execute(
        f"SELECT doc_id, cluster_id, quality, keep "
        f"FROM '{out_glob('x58_quality_survivors')}' ORDER BY doc_id"
    ).fetchall()
    if len(expected) != len(got):
        sys.exit(f"FAIL x58: {len(got)} rows vs {len(expected)} expected")
    bad = sum(1 for e, g in zip(expected, got) if e != g)
    if bad:
        for e, g in zip(expected, got):
            if e != g:
                print(f"  first diff: engine {g} vs recomputed {e}")
                break
        sys.exit(f"FAIL x58: {bad} mismatching rows of {len(got)}")
    print(f"ok   x58_quality_survivors (composed check: {len(got)} rows, "
          f"0 mismatches)")
    print()
    print("0 failures")


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2])
