#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: compare_oracle.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: read the Spark parquet result,
run the matching oracle SQL from oracle_sql.json in DuckDB (tables
registered as views over sfDir parquet), sort columns by name, and
compare values row-by-row. Reports value mismatches and dtype diffs.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # timestamps: compare as ns-int
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    import os
    fails = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        spark_df = norm(pd.read_parquet(qdir))
        if name not in oracles:
            print(f"{name:28s} NO-ORACLE rows={len(spark_df)}")
            continue
        duck_df = norm(con.execute(oracles[name]).fetchdf())
        status, notes = "OK", []
        if list(spark_df.columns) != list(duck_df.columns):
            status = "FAIL"
            notes.append(f"cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            status = "FAIL"
            notes.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        else:
            for c in spark_df.columns:
                if str(spark_df[c].dtype) != str(duck_df[c].dtype):
                    notes.append(f"dtype[{c}] spark={spark_df[c].dtype} duck={duck_df[c].dtype}")
                s, d = spark_df[c], duck_df[c]
                try:
                    eq = (s.values == d.values) | (s.isna().values & d.isna().values)
                except Exception:
                    eq = s.astype(str).values == d.astype(str).values
                if not eq.all():
                    status = "FAIL"
                    i = int((~eq).argmax())
                    notes.append(f"value[{c}] row{i} spark={s.iloc[i]!r} duck={d.iloc[i]!r} ({int((~eq).sum())} diffs)")
        if status == "FAIL":
            fails += 1
        print(f"{name:28s} {status} rows={len(spark_df)} {'; '.join(notes)}")
    return fails


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
