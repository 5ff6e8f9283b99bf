#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL on the same sf tables and compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: decimals -> float? NO: compare as strings for exactness
    df = df.astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            results[name] = "EMPTY-OUTPUT"
            continue
        got = pd.concat([pd.read_parquet(f) for f in files])
        if name not in oracle:
            results[name] = f"ROWS-ONLY rows={len(got)} ok={len(got) > 0}"
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-ERROR: {e}"
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA-MISMATCH got={list(g.columns)} exp={list(e.columns)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT-MISMATCH got={len(g)} exp={len(e)}"
        elif not g.equals(e):
            diff = (g != e).any(axis=1)
            idx = diff[diff].index[:3]
            results[name] = f"VALUE-MISMATCH rows={list(idx)}\n  got:\n{g.loc[idx]}\n  exp:\n{e.loc[idx]}"
        else:
            results[name] = f"MATCH rows={len(g)}"
    fails = 0
    for k, v in sorted(results.items()):
        status = "OK " if v.startswith(("MATCH", "ROWS-ONLY rows")) and "ok=False" not in v else "FAIL"
        if status == "FAIL":
            fails += 1
        print(f"[{status}] {k}: {v}")
    print(f"\n{len(results) - fails}/{len(results)} queries pass")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
