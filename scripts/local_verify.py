#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle_sql in
DuckDB over the same parquet tables and compare to the Spark result parquet
(columns sorted by name, values hashed). Usage:
    python3 scripts/local_verify.py <sfDir> <outDir>
(after: sbt "runMain graft.Verify <sfDir> <outDir>")
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes: everything to string with float rounding already done upstream
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = canon(con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}"); n_fail += 1; continue
        ok_schema = list(got.columns) == list(want.columns)
        g, w = got.astype(str), want.astype(str)
        ok_rows = len(g) == len(w)
        ok_vals = ok_schema and ok_rows and g.equals(w)
        if ok_vals:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: schema_match={ok_schema} rows {len(got)} vs {len(want)}")
            if ok_schema:
                diff = (g != w).any(axis=1)
                print(pd.concat([g[diff].head(3).add_prefix('spark_'),
                                 w[diff].head(3).add_prefix('duck_')], axis=1).to_string())
            else:
                print(" spark:", list(got.columns), "\n duck: ", list(want.columns))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
