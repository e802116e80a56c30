#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB on the same parquet tables and hash-compare per query.
Usage: python scripts/check_oracle.py <sfDir> <outDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)."""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: no spark output: {e}")
        fails += 1
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue
    got = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
    exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
    if sorted(got.columns) != sorted(exp.columns):
        print(f"FAIL {name}: columns {sorted(got.columns)} vs {sorted(exp.columns)}")
        fails += 1
    elif len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
        fails += 1
    elif not got.astype(str).equals(exp.astype(str)):
        diff = (got.astype(str) != exp.astype(str)).any(axis=1)
        print(f"FAIL {name}: {diff.sum()} mismatched rows, first:")
        print(got[diff].head(3))
        print(exp[diff].head(3))
        fails += 1
    else:
        print(f"OK   {name}: {len(got)} rows")
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
