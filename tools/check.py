#!/usr/bin/env python3
"""Dev-only oracle pre-validation (mimics the driver's correctness gate).

NOT part of the engine (the engine is Scala/Spark only) — this script just
lets the builder run the same DuckDB-vs-Spark compare locally before the
driver does, so oracle-SQL mistakes are caught early.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # driver sorts columns by name before hashing values
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types for comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})")
            n_bad += 1
            continue
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        g, w = norm(got), norm(want)
        ordered_eq = g.shape == w.shape and list(g.columns) == list(w.columns) \
            and g.astype(str).equals(w.astype(str))
        # row-order-insensitive fallback view
        gs = g.astype(str).sort_values(by=list(g.columns)).reset_index(drop=True) if len(g) else g.astype(str)
        ws = w.astype(str).sort_values(by=list(w.columns)).reset_index(drop=True) if len(w) else w.astype(str)
        unordered_eq = gs.equals(ws)
        if ordered_eq:
            print(f"OK   {name}: {len(g)} rows (ordered match)")
        elif unordered_eq:
            print(f"WARN {name}: {len(g)} rows match only after row sort")
        else:
            n_bad += 1
            print(f"FAIL {name}: spark {g.shape} vs oracle {w.shape}")
            if list(g.columns) != list(w.columns):
                print(f"  cols spark={list(g.columns)} oracle={list(w.columns)}")
            else:
                diff = (g.astype(str) != w.astype(str)).any(axis=1)
                idx = diff[diff].index[:3]
                for i in idx:
                    print(f"  row {i}:\n   spark : {g.loc[i].to_dict()}\n   oracle: {w.loc[i].to_dict()}")
    print(f"{'ALL OK' if n_bad == 0 else f'{n_bad} FAILURES'} / {len(oracle)} queries")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
