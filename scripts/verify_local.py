#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each parquet dump in
outDir, run the matching oracle SQL in DuckDB over the testdata tables and
compare values (columns sorted by name, rows sorted by all columns).

usage: scripts/verify_local.py [sfDir] [outDir] [query ...]
"""
import json, os, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                eq = (av.isna() & bv.isna()) | (av == bv)
            else:
                eq = (av.isna() & bv.isna()) | (av.astype(object) == bv.astype(object))
        except Exception as e:
            return f"COMPARE-ERR col {c}: {e}"
        if not eq.all():
            i = (~eq).idxmax()
            return f"VALUE col {c} row {i}: spark={a[c][i]!r} duck={b[c][i]!r} ({int((~eq).sum())} diffs)"
    return None


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out)):
        path = os.path.join(out, name)
        if not os.path.isdir(path) or (only and name not in only):
            continue
        spark_df = con.execute(f"SELECT * FROM '{path}/*.parquet'").df()
        if name not in oracles:
            print(f"{'ROWS-ONLY':10} {name}: {len(spark_df)} rows")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{'ORACLE-ERR':10} {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        diff = compare(name, spark_df, duck_df)
        if diff:
            print(f"{'FAIL':10} {name}: {diff}")
            n_fail += 1
        else:
            print(f"{'PASS':10} {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
