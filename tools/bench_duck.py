#!/usr/bin/env python3
"""DuckDB-side timing of the oracle queries (baseline for BENCH comparison).
Usage: python3 tools/bench_duck.py <sfDir> <oracle_sql.json>
"""
import sys, json, time, duckdb

sf, oracle_path = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(oracle_path))
out = {}
for name in sorted(oracle):
    best = None
    for _ in range(2):
        t0 = time.time()
        con.execute(oracle[name]).fetchall()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 4)
print(json.dumps({"total": round(sum(out.values()), 3), "queries": out}))
