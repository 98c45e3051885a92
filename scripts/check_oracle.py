#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read each
<out>/<name> parquet written by graft.Verify, run the matching SQL from
oracle_sql.json in DuckDB over the same sf parquet tables, canonicalize
(sort columns by name, stringify values), and diff.

Usage: check_oracle.py <sfDir> <verifyOut> [--skip name1,name2] [--only name1,name2]

--skip excludes queries whose ORACLE formulation is infeasible at the
given scale (x21/x23's recursive CTE is quadratic in component size —
use check_cc.py for those at sf>=0.1); skipped names are listed so the
output can't silently read as full coverage.
"""
import decimal
import json, sys, glob, os
import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        # Round-1 lesson: DECIMAL canonicalizes differently in the driver's
        # hash path than locally (q07/q09/q15/q25/q31/q32 passed here, failed
        # there). Forbid decimal outputs outright so local-green ⇒ driver-green.
        raise ValueError(
            "DECIMAL output column detected — surface ROUND(CAST(x AS DOUBLE), k) "
            "in the final projection instead (keep decimal math internal)")
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    return [tuple(canon_cell(r[i]) for i in order) for r in rows]

def match(name, pats):
    # full names or id prefixes: "x21" matches x21_dupclusters
    return any(name == s or name.startswith(s + "_") for s in pats)

def main(sf_dir, out_dir, skip=(), only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracles):
        # --only: positive filter for single-query iteration (skipping a
        # full-gate rerun); silent pass-over, unlike --skip's loud line,
        # because an --only run never claims full coverage
        if only is not None and not match(name, only):
            continue
        # prefix matching ("x21" skips x21_dupclusters): the documented
        # `--skip x21,x23` silently matched NOTHING under the
        # exact-name test, so the supposedly-skipped quadratic CTE
        # ran anyway (30+ GB, hours, at sf1)
        if match(name, skip):
            print(f"skip {name} (oracle infeasible at this scale; "
                  f"verify separately)")
            continue
        sql = oracles[name]
        res_dir = f"{out_dir}/{name}"
        # read EVERY part-file: coalesce(1) writes one today, but a
        # multi-part output must not silently drop rows
        files = sorted(glob.glob(f"{res_dir}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); failures += 1; continue
        tbl = pa.concat_tables(pq.read_table(f) for f in files)
        spark_names = tbl.column_names
        spark_rows = [tuple(r[c] for c in spark_names)
                      for r in tbl.to_pylist()] if tbl.num_rows else []
        spark_rows = [tuple(r.values()) for r in tbl.to_pylist()]
        try:
            # con.sql is lazy: .columns/.types come from planning only,
            # execution happens once at fetchall.
            rel = con.sql(sql)
            duck_names = list(rel.columns)
            # Round-10 lesson (x47, red two driver rounds): DuckDB types
            # SUM(BIGINT) as HUGEINT (int128). Locally that arrives as a
            # plain Python int and str()-canonicalizes like a BIGINT, but
            # the driver's type-sensitive hash path renders it differently
            # (int128 → float64/decimal in arrow/pandas → "32.0" vs "32").
            # The decimal guard in canon_cell only catches Decimal VALUES;
            # int128 slips through it — so guard on the RESULT TYPE.
            bad = [f"{c}:{t}" for c, t in zip(duck_names, map(str, rel.types))
                   if "HUGEINT" in str(t).upper()
                   or str(t).upper().startswith("DECIMAL")]
            if bad:
                print(f"FAIL {name}: oracle output column(s) typed "
                      f"HUGEINT/DECIMAL ({', '.join(bad)}) — CAST integer "
                      f"outputs to BIGINT / ROUND(CAST(x AS DOUBLE), k) in "
                      f"the final projection (driver hash is type-sensitive)")
                failures += 1; continue
            duck_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); failures += 1; continue
        if sorted(spark_names) != sorted(duck_names):
            print(f"FAIL {name}: columns spark={spark_names} duck={duck_names}")
            failures += 1; continue
        try:
            cs, cd = canon(spark_rows, spark_names), canon(duck_rows, duck_names)
        except ValueError as e:
            print(f"FAIL {name}: {e}"); failures += 1; continue
        if len(cs) != len(cd):
            print(f"FAIL {name}: rows spark={len(cs)} duck={len(cd)}")
            failures += 1; continue
        if cs != cd:
            bad = next(i for i in range(len(cs)) if cs[i] != cd[i])
            print(f"FAIL {name}: first diff at row {bad}:")
            print(f"   spark={cs[bad]}")
            print(f"   duck ={cd[bad]}")
            failures += 1; continue
        print(f"ok   {name} ({len(cs)} rows)")
    # queries with no oracle: rows-only presence check
    for d in sorted(os.listdir(out_dir)):
        full = f"{out_dir}/{d}"
        if only is not None and not match(d, only):
            continue
        if os.path.isdir(full) and d not in oracles:
            files = sorted(glob.glob(f"{full}/*.parquet"))
            n = sum(pq.read_table(f).num_rows for f in files) if files else -1
            status = "ok  " if n > 0 else "FAIL"
            if n <= 0: failures += 1
            print(f"{status} {d} (rows-only: {n})")
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(
        description="Compare graft.Verify output against the DuckDB oracle")
    ap.add_argument("sfDir", help="testdata scale-factor dir (the tables)")
    ap.add_argument("verifyOut", help="graft.Verify output dir")
    ap.add_argument("--skip", default="",
                    help="comma-separated query names whose oracle is "
                         "infeasible at this scale (use check_cc.py); "
                         "id prefixes match (\"x21\" = x21_dupclusters)")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names/id prefixes to check, "
                         "all others silently passed over — for "
                         "single-query iteration without a full-gate rerun")
    ns = ap.parse_args()
    skip = {s for s in ns.skip.split(",") if s}
    only = ({s for s in ns.only.split(",") if s}
            if ns.only is not None else None)
    main(ns.sfDir, ns.verifyOut, skip=skip, only=only)
