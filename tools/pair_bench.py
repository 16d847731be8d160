#!/usr/bin/env python3
"""Query-granularity interleaved Spark/DuckDB bench pair.

The per-suite back-to-back protocol lets a co-tenant burst hit one arm and
not the other (round 14: four sf100 windows, four asymmetric bursts,
0.87-1.25x band). This orchestrator alternates ONE Spark query with the
SAME query in DuckDB, over several rounds, and reports per-query medians —
a burst lands on both arms of the neighbourhood it hits, and the median
discards it.

Usage:
  python3 tools/pair_bench.py <sfdir> <oracle_sql.json> <rounds> [query ...]

Env: SPARK_GRAFT_CONF is passed through to the Spark arm (layout posture).
Prints one JSON document: per-query times/medians/ratios + totals.
Protocol: one unrecorded warm-up round, then <rounds> recorded rounds; the
arm order within each (query, round) pair flips every round so neither arm
systematically runs first.
"""
import json
import os
import statistics
import subprocess
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

HEADLINE = ["q01_tpch_q1", "q02_tpch_q6", "q22_tpch_q3",
            "h02_min_cost_supplier", "h05_local_supplier",
            "h09_product_profit", "h10_returned_items",
            "h10_returned_items_orig", "h14_promo_effect",
            "h18_large_volume", "h21_waiting_supplier"]


def loadavg():
    return float(open("/proc/loadavg").read().split()[0])


def main():
    sfdir, oraclef, rounds = sys.argv[1], sys.argv[2], int(sys.argv[3])
    names = sys.argv[4:] or HEADLINE
    oracle = json.load(open(oraclef))
    for n in names:
        if n not in oracle:
            raise SystemExit(f"no oracle SQL for {n}")

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")

    server = subprocess.Popen(
        ["tools/run.sh", "graft.tools.BenchServer", sfdir],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, bufsize=1,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ready = json.loads(server.stdout.readline())
    assert ready.get("ready"), ready

    def spark_run(name):
        server.stdin.write(name + "\n")
        server.stdin.flush()
        r = json.loads(server.stdout.readline())
        assert r.get("q") == name and "sec" in r, r
        return r["sec"], float(r["load"])

    def duck_run(name):
        t0 = time.time()
        con.execute(oracle[name]).fetchall()
        return round(time.time() - t0, 3), loadavg()

    res = {n: {"spark": [], "duck": [], "loads": []} for n in names}
    load_start = loadavg()
    for rnd in range(rounds + 1):  # round 0 = unrecorded warm-up
        for i, n in enumerate(names):
            arms = [("spark", spark_run), ("duck", duck_run)]
            if rnd % 2 == 1:
                arms.reverse()
            for arm, fn in arms:
                sec, load = fn(n)
                if rnd > 0:
                    res[n][arm].append(sec)
                    res[n]["loads"].append(load)
    server.stdin.write("exit\n")
    server.stdin.flush()
    server.wait(timeout=120)

    out = {"sf": sfdir, "rounds": rounds,
           "conf": os.environ.get("SPARK_GRAFT_CONF", ""),
           "load_start": load_start, "load_end": loadavg(), "queries": {}}
    st = dt = 0.0
    for n in names:
        sm = round(statistics.median(res[n]["spark"]), 3)
        dm = round(statistics.median(res[n]["duck"]), 3)
        st += sm
        dt += dm
        out["queries"][n] = {
            "spark": res[n]["spark"], "duck": res[n]["duck"],
            "spark_med": sm, "duck_med": dm,
            "ratio": round(sm / dm, 3) if dm > 0 else None,
            "load_max": max(res[n]["loads"])}
    out["spark_total_med"] = round(st, 3)
    out["duck_total_med"] = round(dt, 3)
    out["ratio"] = round(st / dt, 3) if dt else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
