#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB (the BASELINE.md comparison column).

Methodology matches BASELINE.md: 16 threads, one warm-up execution,
second run timed with results fetched.

Usage: python3 tools/bench_oracle.py <sfDir> <outDirWithOracleJson> [query ...]
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    total = 0.0
    for name in sorted(oracle):
        if only and not any(s in name for s in only):
            continue
        sql = oracle[name]
        try:
            con.execute(sql).fetchall()  # warm-up
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            dt = time.perf_counter() - t0
            total += dt
            print(f"{name}\t{dt:.3f}")
        except Exception as e:
            print(f"{name}\tERR {str(e).splitlines()[0][:80]}")
    print(f"TOTAL\t{total:.3f}")


if __name__ == "__main__":
    main()
