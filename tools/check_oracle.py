#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling only;
the Scala library has no Python dependency).

Usage: check_oracle.py <verify_out_dir> <sf_dir>

Runs each oracle_sql.json statement in DuckDB against views over the sf
parquet tables, loads the corresponding Spark parquet output, and compares:
schema (column names sorted), row count, and exact cell values (rows sorted
by all columns, columns sorted by name — the strictest plausible reading of
the driver's hash compare).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

def cells_equal(a, b) -> bool:
    if a.shape != b.shape:
        return False
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            ok = np.array_equal(av.astype(float), bv.astype(float), equal_nan=True)
        else:
            ok = (pd.isna(av) & pd.isna(bv)) | (av == bv)
            ok = bool(np.all(ok))
        if not ok:
            return False
    return True

def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sf_dir}/*.parquet")):
        name = os.path.basename(p)[: -len(".parquet")]
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(oracles):
        try:
            spark = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            oracle = con.sql(oracles[name]).df()
            s, o = normalize(spark), normalize(oracle)
            schema_ok = list(s.columns) == list(o.columns)
            rows_ok = len(s) == len(o)
            vals_ok = schema_ok and rows_ok and cells_equal(s, o)
            # also check as-emitted row order (driver may not sort rows)
            order_ok = vals_ok and cells_equal(
                spark.reindex(sorted(spark.columns), axis=1).reset_index(drop=True),
                oracle.reindex(sorted(oracle.columns), axis=1).reset_index(drop=True))
            status = "OK " if (vals_ok and order_ok) else ("SORTED-ONLY" if vals_ok else "FAIL")
            if not (vals_ok and order_ok):
                n_fail += 1
            print(f"{status} {name}: rows={len(s)}/{len(o)} schema={schema_ok}")
            if not vals_ok and schema_ok and rows_ok:
                diff = (s != o) & ~(s.isna() & o.isna())
                bad_cols = [c for c in s.columns if diff[c].any()]
                for c in bad_cols[:3]:
                    i = diff[c].idxmax()
                    print(f"    first diff col={c} row={i}: spark={s[c][i]!r} oracle={o[c][i]!r}")
            elif not schema_ok:
                print(f"    spark cols={list(s.columns)} oracle cols={list(o.columns)}")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {e}")
    # entries without oracle: rows-only check
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracles:
            try:
                n = len(con.sql(f"SELECT * FROM '{d}*.parquet'").df())
                print(f"{'OK ' if n > 0 else 'EMPTY'} {name} (rows-only): rows={n}")
                if n == 0:
                    n_fail += 1
            except Exception as e:
                n_fail += 1
                print(f"ERROR {name} (rows-only): {e}")
    print(f"\n{'ALL GREEN' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
