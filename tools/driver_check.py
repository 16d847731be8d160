#!/usr/bin/env python3
"""Exact mimic of the driver's t2 hash gate (stricter than oracle_check.py).

Spark side: read the result parquet with pandas/pyarrow directly (NOT through
DuckDB) — so decimals arrive as decimal.Decimal objects, timestamps as
pyarrow-converted dtypes, arrays as ndarrays: exactly what the driver sees.
Oracle side: duckdb .fetchdf().

Canonicalize both: sort columns by name, sort rows by all columns (astype(str)
like the driver — an unhashable ndarray column reproduces the driver's
TypeError), then compare str(value) cell-by-cell.

Usage: python3 tools/driver_check.py <sfdir> <outdir> [query ...]
"""
import glob
import os
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # Driver-style sort: no str key — this is what explodes on ndarray cols.
    df = df.sort_values(by=list(df.columns))
    return df.reset_index(drop=True)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        # multi-file fixtures (tools ScaleUp) are directories of part files
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            parts = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
            got = canon(pd.concat([pd.read_parquet(p) for p in parts],
                                  ignore_index=True))
        except Exception as e:
            print(f"FAIL {name}: spark-side {type(e).__name__}: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle-side {type(e).__name__}: {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        # Midnight-timestamp == date (the real driver accepted date-vs-
        # timestamp on q73 in r01, so don't flag that representation).
        norm = lambda rows: [[v[:-9] if v.endswith(" 00:00:00") else v
                              for v in r] for r in rows]
        ga = norm(got.astype(str).values.tolist())
        wa = norm(want.astype(str).values.tolist())
        if ga != wa:
            shown = 0
            for i in range(len(ga)):
                for j, c in enumerate(got.columns):
                    if ga[i][j] != wa[i][j]:
                        print(f"FAIL {name}: row {i} col {c}: spark={ga[i][j]!r}"
                              f" ({type(got[c].iloc[i]).__name__}/{got[c].dtype})"
                              f" oracle={wa[i][j]!r}"
                              f" ({type(want[c].iloc[i]).__name__}/{want[c].dtype})")
                        shown += 1
                        break
                if shown >= 3:
                    break
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
