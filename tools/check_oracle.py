#!/usr/bin/env python3
"""DEV-ONLY harness (mimics the driver's t2 correctness gate; not part of the
library). Usage:
    sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
Compares each <name>.parquet written by graft.Verify against the DuckDB
result of oracle_sql.json[<name>] over the same sf tables: column names,
row counts, and value hash after sorting columns by name and rows by value.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats
    for c in df.columns:
        if df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    dirs = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
            if os.path.isdir(p)}
    # a query that crashed in Verify writes no dir — that must count as a
    # failure, not silently shrink the denominator
    names = sorted(dirs | set(oracle))
    n_ok = 0
    for name in names:
        if name not in dirs:
            print(f"\u2717 {name:32s} MISSING (query failed in Verify)")
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in
                              glob.glob(f"{out_dir}/{name}/*.parquet")],
                             ignore_index=True)
        if name not in oracle:
            print(f"  {name:32s} rows={len(spark_df):7d}  (rows-only, no oracle)")
            n_ok += len(spark_df) > 0
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"✗ {name:32s} ORACLE SQL ERROR: {e}")
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"✗ {name:32s} SCHEMA: spark={list(a.columns)} duck={list(b.columns)}")
        elif len(a) != len(b):
            print(f"✗ {name:32s} ROWS: spark={len(a)} duck={len(b)}")
        elif not a.equals(b):
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            print(f"✗ {name:32s} VALUES differ in {bad.sum()}/{len(a)} rows")
            print(pd.concat([a[bad].head(3).add_suffix("_spark"),
                             b[bad].head(3).add_suffix("_duck")], axis=1))
        else:
            print(f"✓ {name:32s} rows={len(a):7d} MATCH")
            n_ok += 1
    print(f"== {n_ok}/{len(names)} ok")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
