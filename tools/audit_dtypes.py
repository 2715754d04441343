#!/usr/bin/env python3
"""Audit oracle + spark result dtypes for driver-hash hazards: tz-aware
datetimes, object columns holding non-strings (HUGEINT, Decimal, lists),
dtype disagreements between the Spark parquet and the DuckDB result.

Usage: audit_dtypes.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os, datetime
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    con.sql(f"CREATE VIEW {os.path.basename(p).replace('.parquet','')} "
            f"AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
issues = 0
for name in sorted(oracle):
    d = os.path.join(outdir, name)
    try:
        duck = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE ERROR {e}")
        issues += 1
        continue
    # a failed/partial write can leave the dir with no part files —
    # pd.concat([]) raises, which would abort the whole audit
    files = sorted(glob.glob(f"{d}/*.parquet")) if os.path.isdir(d) else []
    spark = pd.concat([pd.read_parquet(f) for f in files]) if files else None
    for side, df in (("duck", duck), ("spark", spark)):
        if df is None:
            continue
        for c in df.columns:
            dt = str(df[c].dtype)
            if dt.startswith("datetime64") and "," in dt:
                print(f"{name}: {side}.{c} TZ-AWARE {dt}")
                issues += 1
            elif dt == "object":
                nn = df[c].dropna()
                if len(nn):
                    v = nn.iloc[0]
                    if not isinstance(v, (str, bytes, datetime.date,
                                          list, tuple, dict)) and \
                       type(v).__module__ != "numpy":
                        print(f"{name}: {side}.{c} object of "
                              f"{type(v).__name__} (e.g. {v!r})")
                        issues += 1
    if spark is not None and list(sorted(spark.columns)) == \
            list(sorted(duck.columns)):
        for c in duck.columns:
            a, b = str(spark[c].dtype), str(duck[c].dtype)
            if a != b and not (a.startswith("datetime64") or
                               b.startswith("datetime64")):
                print(f"{name}: dtype drift {c} spark={a} duck={b}")
                issues += 1
print(f"\n{issues} issues over {len(oracle)} oracles")
