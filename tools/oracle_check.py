#!/usr/bin/env python3
"""Local mimic of the driver's t2 gate: for each query dir written by
graft.Verify, run the oracle SQL in DuckDB over the same parquet tables,
sort columns by name + rows by all columns, and diff values.

Usage: python3 tools/oracle_check.py <sfdir> <outdir> [query ...]
"""
import json, sys, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def cell_eq(a, b):
    if a is None and b is None:
        return True
    try:
        if isinstance(a, float) or isinstance(b, float):
            if a is None or b is None:
                return False
            if math.isnan(a) and math.isnan(b):
                return True
            return a == b or abs(a - b) <= 1e-12 * max(1.0, abs(a), abs(b))
    except TypeError:
        pass
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(cell_eq(x, y) for x, y in zip(la, lb))
    return str(a) == str(b)


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    import os
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").fetchdf())
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: exception {str(e).splitlines()[0][:200]}")
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
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                a, b = got[c].iloc[i], want[c].iloc[i]
                if (a is None or (isinstance(a, float) and math.isnan(a))) and \
                   (b is None or (isinstance(b, float) and math.isnan(b))):
                    continue
                if not cell_eq(a, b):
                    bad = (i, c, a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            # exact-string hash equality check (stricter, driver-like)
            ga = got.astype(str).values.tolist()
            wa = want.astype(str).values.tolist()
            tag = "PASS" if ga == wa else "PASS(tol)"
            print(f"{tag} {name}: {len(got)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
