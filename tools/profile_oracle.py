#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB against the sf-dir parquet tables.
Prints per-query seconds sorted descending, and the total.

Usage: profile_oracle.py <sfDir> <verifyOutDir> [minSecToPrint]
"""
import sys, json, glob, os, time
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
minp = float(sys.argv[3]) if len(sys.argv) > 3 else 0.2
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
times = []
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.sql(oracle[name]).df()
        err = ""
    except Exception as e:
        err = f"  ERROR {e}"
    dt = time.time() - t0
    times.append((dt, name, err))
total = sum(t for t, _, _ in times)
for dt, name, err in sorted(times, reverse=True):
    if dt >= minp or err:
        print(f"{dt:8.2f}  {name}{err}")
print(f"\nTOTAL {total:.1f} s over {len(times)} oracles")
