#!/usr/bin/env python3
"""Local differential checker mirroring the driver's t2 gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [key ...]

For each key in <verifyOutDir>/oracle_sql.json (or the given subset):
run the oracle SQL in DuckDB over views of <sfDir>/*.parquet, load the
Spark result parquet, sort columns by name, and compare row count,
column names, dtypes, and values. Exit 1 on any mismatch.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        probs = []
        if list(got.columns) != list(want.columns):
            probs.append(f"cols spark={list(got.columns)} duck={list(want.columns)}")
        elif got.shape != want.shape:
            probs.append(f"shape spark={got.shape} duck={want.shape}")
        else:
            for c in got.columns:
                if str(got[c].dtype) != str(want[c].dtype):
                    probs.append(f"dtype[{c}] spark={got[c].dtype} duck={want[c].dtype}")
            gs, ws = got.astype(str), want.astype(str)
            neq = (gs != ws).any(axis=1)
            if neq.any():
                i = int(neq.idxmax())
                probs.append(f"{int(neq.sum())} rows differ; first at row {i}:\n"
                             f"  spark: {got.iloc[i].to_dict()}\n"
                             f"  duck : {want.iloc[i].to_dict()}")
        if probs:
            print(f"FAIL {name}: " + " | ".join(probs))
            n_fail += 1
        else:
            print(f"PASS {name} ({got.shape[0]} rows)")
            n_pass += 1
    # keys declared in queries but missing an oracle: report for visibility
    declared = {os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)}
    noracle = declared - set(oracle)
    if noracle:
        print(f"note: rows-only keys (no oracle): {sorted(noracle)}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
