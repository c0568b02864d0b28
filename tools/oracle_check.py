#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate (SURVEY.md §5.2).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [key ...]

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), binds the
fixture tables to <sfDir>, runs each oracle SQL in DuckDB, and compares
values against the Spark-written parquet at <verifyOutDir>/<key>/.
Columns are sorted by name before compare (mirrors the driver). Exits 1
on any mismatch. Run this BEFORE declaring a query done.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracle = json.load(f)
    fails, n_run = [], 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        n_run += 1
        sql = oracle[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: missing spark output dir/parquet")
            fails.append(name)
            continue
        try:
            odf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails.append(name)
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark-output read error: {e}")
            fails.append(name)
            continue
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: columns oracle={ocols} spark={scols}")
            fails.append(name)
            continue
        odf, sdf = odf[ocols], sdf[scols]
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows oracle={len(odf)} spark={len(sdf)}")
            fails.append(name)
            continue
        ov = odf.astype(str).values.tolist()
        sv = sdf.astype(str).values.tolist()
        if ov != sv:
            bad = None
            for i, (a, b) in enumerate(zip(ov, sv)):
                if a != b:
                    bad = i
                    break
            print(f"FAIL {name}: first value diff at row {bad}:")
            print(f"  oracle: {ov[bad]}")
            print(f"  spark : {sv[bad]}")
            fails.append(name)
            continue
        print(f"OK   {name} ({len(odf)} rows, {len(ocols)} cols)")
    print(f"\n{n_run - len(fails)}/{n_run} OK" + (f"; FAIL: {fails}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
