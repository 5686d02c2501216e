#!/usr/bin/env python3
"""Time each oracle SQL twin in embedded DuckDB over the fixture parquet.

Usage: duckbench.py <sfdir> <oracle_sql.json from a Verify run> [out.json]
Pairs with graft.Bench: same queries, single-threaded embedded engine —
the honest local comparison recorded in BASELINE.md.
"""
import json, sys, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    out_path = sys.argv[3] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    # the BASELINE.md comparison is against the SINGLE-THREADED embedded
    # engine; duckdb defaults to all hardware threads
    con.execute("SET threads=1")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(oracle_path))
    times = {}
    for name, sql in sorted(oracles.items()):
        t0 = time.time()
        con.execute(sql).fetchall()
        times[name] = round(time.time() - t0, 3)
    result = {"total": round(sum(times.values()), 2), "queries": times}
    print(json.dumps(result))
    if out_path:
        json.dump(result, open(out_path, "w"))

if __name__ == "__main__":
    main()
