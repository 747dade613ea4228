#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB (the BASELINE.md comparison column).

Methodology matches BASELINE.md: 16 threads, one warm-up execution,
second run timed with results fetched.

Usage:
  python3 tools/bench_oracle.py <sfDir> <outDirWithOracleJson> \
      [--json BENCH_ORACLE.json] [query ...]

With --json, also writes a machine-readable artifact mirroring the
driver's BENCH_rNN.json shape ({"queries": {name: sec}, ...}) so the
Spark and DuckDB columns can be diffed mechanically; failed queries
record null.
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    sf, out = args[0], args[1]
    only = args[2:]
    con = duckdb.connect()
    con.execute("SET threads TO 16")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    total = 0.0
    per_query = {}
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
            per_query[name] = round(dt, 3)
            print(f"{name}\t{dt:.3f}")
        except Exception as e:
            per_query[name] = None
            print(f"{name}\tERR {str(e).splitlines()[0][:80]}")
    print(f"TOTAL\t{total:.3f}")
    if json_out:
        rec = {"metric": "duckdb_oracle_sec", "value": round(total, 3),
               "unit": "sec", "sf": sf, "threads": 16,
               "methodology": "warm-up run, second run timed with fetch",
               "queries": per_query}
        with open(json_out, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")


if __name__ == "__main__":
    main()
