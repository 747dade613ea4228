#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, loads the Spark result parquet from
<outDir>/<name>/ **via pyarrow/pandas (the driver's read path — DuckDB's
own parquet reader papers over INT96/ns issues pyarrow does not)**,
sorts columns by name and rows by all columns, and compares:

  - column *types* first (kind-level: int vs float vs bool vs object vs
    datetime) — a DuckDB HUGEINT (SUM over ints) materializes as
    float64 while Spark emits int64; the driver's hash gate fails on
    that even when the values are numerically equal, so we fail too.
  - then cell values: exact for non-floats, 1e-9 rel tolerance for
    floats (reporting the max float divergence so we know our margin).

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [query ...]
"""
import sys, json, math, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # parquet DATE reads back as object(datetime.date) via pyarrow but
        # as datetime64 via DuckDB; tz-aware reads drop to naive. The
        # driver's gate treats both as equal — normalize the same way.
        if df[c].dtype.kind == "O":
            nn = df[c].dropna()
            if len(nn) and type(nn.iloc[0]).__name__ == "date":
                df[c] = pd.to_datetime(df[c])
        if df[c].dtype.kind == "M" and getattr(df[c].dtype, "tz", None):
            df[c] = df[c].dt.tz_localize(None)
    if len(df) == 0:
        return df.reset_index(drop=True)
    # stringify for a stable multi-column sort (mixed types sort fine)
    key = df.astype(str).apply(lambda r: "\x01".join(r), axis=1)
    return df.iloc[key.argsort(kind="mergesort").values].reset_index(drop=True)


def kind(dtype) -> str:
    """Dtype equivalence class for the driver's hash: int/uint collapse,
    datetime units (ns vs us) collapse, everything else by kind."""
    k = dtype.kind
    if k in ("i", "u"):
        return "int"
    if k == "M":
        return "datetime"
    return k  # f=float, b=bool, O=object


def cmp_cell(a, b):
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return (str(a) == str(b)), 0.0
        if math.isnan(fa) and math.isnan(fb):
            return True, 0.0
        d = abs(fa - fb)
        tol = 1e-9 * max(1.0, abs(fa), abs(fb))
        return d <= tol, d
    return (str(a) == str(b)), 0.0


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        # driver fixtures are single files; ScaleGen fixtures are Spark
        # directory writes -- glob part files in that case
        pat = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(pat):
            pat = f"{pat}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            # pyarrow read = the driver's path; ns coercion bugs surface here
            got = norm(pd.concat([pd.read_parquet(f) for f in files],
                                 ignore_index=True))
            exp = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} "
                  f"oracle={list(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        dtype_bad = [
            (c, got[c].dtype, exp[c].dtype) for c in got.columns
            if kind(got[c].dtype) != kind(exp[c].dtype)]
        if dtype_bad:
            c, gd, ed = dtype_bad[0]
            more = f" (+{len(dtype_bad) - 1} more)" if len(dtype_bad) > 1 else ""
            print(f"FAIL {name}: dtype col {c}: spark={gd} oracle={ed}{more}")
            n_fail += 1
            continue
        bad, maxd = None, 0.0
        for c in got.columns:
            for i, (a, b) in enumerate(zip(got[c], exp[c])):
                ok, d = cmp_cell(a, b)
                maxd = max(maxd, d)
                if not ok:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col {c} row {i}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            extra = f" maxFloatDiff={maxd:.2e}" if maxd else ""
            print(f"PASS {name}: {len(got)} rows{extra}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
