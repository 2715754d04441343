#!/usr/bin/env python3
"""Regenerate a PINNED oracle (a `SELECT * FROM (VALUES ...)` constant) from
a graft.Verify output directory.

A pin is a DETERMINISM/REGRESSION check, not independent verification —
the constant is quoted from this implementation's own output. Policy
(r10): keep a pin ONLY when a portable-SQL re-derivation is genuinely
impossible, tag it in SparkEntry.oracleProvenance, and cover its
semantics with a ScalaTest spec. Current pins: q70/q77 only
(GK-percentile / HLL sketch internals). The former IVF/describe/sign-LSH
pins (q25/q38/q43/q46/q143) were all upgraded to full DuckDB replays in
r10 — even splitmix64's wrapping 64-bit arithmetic replays in HUGEINT
mod 2^64 — so prefer that route.

Usage: pin_oracle.py <verifyOutDir> <queryName> [<queryName> ...]
Paste the printed SQL into SparkEntry.oracleSql. Re-run whenever the
driver's testdata changes (the pin is a constant of the data).
"""
import sys, glob
import pandas as pd

outdir = sys.argv[1]
for q in sys.argv[2:]:
    df = pd.concat([pd.read_parquet(f)
                    for f in sorted(glob.glob(f"{outdir}/{q}/*.parquet"))])
    rows = []
    for _, r in df.iterrows():
        vals = []
        for c in df.columns:
            v = r[c]
            if v is None or (isinstance(v, float) and pd.isna(v)):
                # genuine NULL (describe's non-numeric stats): typed so
                # DuckDB's VALUES column type matches the data rows
                t = {"float64": "DOUBLE", "int64": "BIGINT"}.get(
                    str(df[c].dtype), "VARCHAR")
                vals.append(f"CAST(NULL AS {t})")
            elif str(df[c].dtype) == "float64":
                # repr = shortest round-trip literal; DuckDB's parse is
                # correctly rounded, so the pinned double is bit-exact
                vals.append(f"CAST({float(v)!r} AS DOUBLE)")
            elif str(df[c].dtype) == "int64":
                vals.append(f"CAST({int(v)} AS BIGINT)")
            else:
                vals.append("'" + str(v).replace("'", "''") + "'")
        rows.append("(" + ", ".join(vals) + ")")
    cols = ", ".join(df.columns)
    print(f"-- {q} ({len(df)} rows)")
    print(f"SELECT * FROM (VALUES {', '.join(rows)}) AS t({cols})")
    print()
