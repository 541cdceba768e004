#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against Verify output.

Mimics the driver's DuckDB compare: loads each Verify parquet result and the
corresponding oracle SQL result, sorts columns by name, sorts rows, and
compares values. Dev tool only — the engine itself has no Python dependency.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fail += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no Spark result")
        fail += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in files])
    # normalize: sort columns by name, normalize tz, sort rows
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[c]):
                try: df[c] = df[c].dt.tz_localize(None)
                except TypeError: df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    exp, got = norm(exp), norm(got)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fail += 1
        continue
    ok = True
    for c in exp.columns:
        a, b = exp[c].values, got[c].values
        if pd.api.types.is_float_dtype(exp[c]) or pd.api.types.is_float_dtype(got[c]):
            af = pd.to_numeric(exp[c], errors="coerce").values.astype(float)
            bf = pd.to_numeric(got[c], errors="coerce").values.astype(float)
            # the driver hashes raw BITS: -0.0 == 0.0 under ==, but they
            # hash differently — require matching sign bits too
            same = (np.isnan(af) & np.isnan(bf)) | (
                (af == bf) & (np.signbit(af) == np.signbit(bf)))
        else:
            same = (pd.isna(exp[c]).values & pd.isna(got[c]).values) | (a == b)
        if not same.all():
            i = int(np.argmin(same))
            print(f"FAIL {name}: col {c} differs at row {i}: exp={a[i]!r} got={b[i]!r}")
            ok = False
            break
    if ok:
        print(f"OK   {name} ({len(exp)} rows)")
    else:
        fail += 1
print(f"\n{len(oracle)-fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
