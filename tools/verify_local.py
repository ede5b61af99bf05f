#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script compares
each <outDir>/<name> parquet against oracle_sql.json run in DuckDB over
the same sfDir tables.

Compare semantics (mirroring the stated driver behavior): sort columns by
name, then row-wise compare after sorting rows by all columns; values
compared with a small float tolerance report plus an exact-hash verdict.
"""
import json
import sys
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints to int64, floats to float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.execute(sql).df()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
                n_fail += 1
                continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} != {len(e)}")
                n_fail += 1
                continue
            diffs = []
            for c in g.columns:
                a, b = g[c], e[c]
                if pd.api.types.is_float_dtype(a):
                    eq = np.isclose(a.fillna(np.nan), b.fillna(np.nan),
                                    rtol=0, atol=0, equal_nan=True)
                    exact = eq.all()
                else:
                    exact = a.equals(b)
                if not exact:
                    diffs.append(c)
            if diffs:
                print(f"FAIL {name}: value mismatch in {diffs}")
                for c in diffs[:2]:
                    mask = ~(g[c].fillna("§") == e[c].fillna("§")) if not pd.api.types.is_float_dtype(g[c]) \
                        else ~np.isclose(g[c], e[c], rtol=0, atol=0, equal_nan=True)
                    print("  got:", g.loc[mask, c].head(3).tolist(),
                          " exp:", e.loc[mask, c].head(3).tolist())
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as ex:
            print(f"ERROR {name}: {str(ex)[:300]}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
