#!/usr/bin/env python3
"""DuckDB side of the same-scale A/B: time the oracle SQL of the headline
bench queries against the same parquet fixture graft.Bench reads.

Usage: python3 tools/duck_bench.py <sfdir> <oracle_sql.json> [query ...]
Prints one JSON line: {"total": sec, "queries": {name: sec}}.
Protocol matches graft.Bench: one warm-up run, then best-of-3 wall time.
"""
import json, sys, time, glob, os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

HEADLINE = ["q01_tpch_q1", "q02_tpch_q6", "q22_tpch_q3", "h02_min_cost_supplier",
            "h05_local_supplier", "h09_product_profit", "h10_returned_items",
            "h14_promo_effect", "h18_large_volume", "h21_waiting_supplier"]


def main():
    sfdir, oraclef = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or HEADLINE
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(oraclef))
    times = {}
    for name in names:
        sql = oracle.get(name)
        if not sql:
            continue
        con.execute(sql).fetchall()  # warm-up (page cache + plan)
        best = None
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        times[name] = round(best, 3)
    print(json.dumps({"total": round(sum(times.values()), 3),
                      "queries": times, "sf": sfdir}))


if __name__ == "__main__":
    main()
