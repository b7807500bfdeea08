#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: replay oracle_sql.json in
DuckDB against the sf parquet tables and compare row count, schema (column
names sorted), and a value hash against the Verify parquet dumps.

Usage: replay_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb, pandas as pd
import hashlib

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    return df

def h(df):
    md = hashlib.md5()
    for col in df.columns:
        s = df[col]
        for v in s:
            # per-value delimiter keeps the encoding injective: without
            # it [1, 112] and [11, 12] would concatenate identically
            if isinstance(v, float):
                md.update(repr(round(v, 9)).encode())
            else:
                md.update(repr(v).encode())
            md.update(b";")
        md.update(b"|")
    return md.hexdigest()

def main():
    sf, out = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if names and name not in names:
            continue
        spath = os.path.join(out, name)
        if not os.path.isdir(spath):
            print(f"{name}: NO SPARK OUTPUT")
            fails += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              sorted(glob.glob(f"{spath}/*.parquet"))],
                             ignore_index=True)
        try:
            ora = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}")
            fails += 1
            continue
        sn, on_ = norm(spark_df), norm(ora)
        rows = len(sn) == len(on_)
        schema = list(sn.columns) == list(on_.columns)
        hmatch = rows and schema and h(sn) == h(on_)
        ok = rows and schema and hmatch
        if not ok:
            fails += 1
        print(f"{name}: rows={rows}({len(sn)}/{len(on_)}) "
              f"schema={schema} hash={hmatch}" + ("" if ok else "  <-- FAIL"))
        if not schema:
            print(f"   spark cols: {list(sn.columns)}")
            print(f"   oracle cols: {list(on_.columns)}")
    print("ALL GREEN" if fails == 0 else f"{fails} FAILURES")
    sys.exit(1 if fails else 0)

main()
