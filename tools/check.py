#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query-substring ...]

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over
<sfDir>/*.parquet, and compares rows/schema/values (columns sorted by
name, rows sorted by all columns, exact string compare with a float
round to 9 significant digits as the hash proxy).
"""
import json, sys, math
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cell(v):
    if v is None:
        return "NULL"
    # date vs midnight-timestamp renders identically on both sides
    if isinstance(v, (pd.Timestamp, np.datetime64)):
        s = str(pd.Timestamp(v))
        return s[:-9] if s.endswith(" 00:00:00") else s
    if v.__class__.__name__ == "date":
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return format(v, ".9g")
    if isinstance(v, np.floating):
        return format(float(v), ".9g")
    return str(v)

def frame_sig(df: pd.DataFrame):
    return [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    subs = sys.argv[3:]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(n for n in oracle if not subs or any(s in n for s in subs))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    fails = 0
    for name in names:
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing ({e})"); fails += 1; continue
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error ({e})"); fails += 1; continue
        s, o = canon(spark_df), canon(ora_df)
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); fails += 1; continue
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: schema {list(s.columns)} vs {list(o.columns)}"); fails += 1; continue
        ssig, osig = frame_sig(s), frame_sig(o)
        if ssig != osig:
            bad = [i for i, (a, b) in enumerate(zip(ssig, osig)) if a != b][:3]
            print(f"FAIL {name}: value mismatch at rows {bad}")
            for i in bad:
                print(f"  spark : {ssig[i]}")
                print(f"  oracle: {osig[i]}")
            fails += 1; continue
        print(f"ok   {name} ({len(s)} rows)")
    print(f"== {len(names)-fails}/{len(names)} pass ==")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
