#!/usr/bin/env python3
"""Render the BASELINE.md comparison table: per-query min over N Spark
bench runs vs DuckDB oracle timings.

Usage:
  python3 tools/baseline_table.py <bench_runs.txt> <duck.tsv>

bench_runs.txt: one Bench JSON line per run (grep '"metric"').
duck.tsv: output of tools/bench_oracle.py (name<TAB>seconds).
"""
import json, re, sys


def main():
    runs = []
    for line in open(sys.argv[1]):
        m = re.search(r'\{"metric".*\}', line)
        if m:
            runs.append(json.loads(m.group(0))["queries"])
    best = {q: min(r[q] for r in runs) for q in runs[0]}
    duck = {}
    for line in open(sys.argv[2]):
        parts = line.strip().split("\t")
        if len(parts) == 2 and not parts[0].startswith("TOTAL"):
            try:
                duck[parts[0]] = float(parts[1])
            except ValueError:
                pass
    print("| query | spark (s) | duckdb (s) |")
    print("|---|---|---|")
    for q in sorted(set(best) | set(duck)):
        s = f"{best[q]:.2f}" if q in best else "— (streaming)"
        d = f"{duck[q]:.3f}" if q in duck else "—"
        print(f"| {q} | {s} | {d} |")
    ts = sum(best.values())
    td = sum(v for q, v in duck.items() if q in best)
    print(f"| **total ({len(best)} batch queries)** | **{ts:.2f}** | **{td:.2f}** |")
    print(f"\nratio: {ts/td:.2f}x  (runs={len(runs)}, per-query min)")


if __name__ == "__main__":
    main()
