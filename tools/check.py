#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry over the sf tables and compares
against the Verify-dumped parquet (columns sorted by name, rows sorted,
exact value equality). Usage:
    python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:  # unify datetime resolution (ns vs us is a pandas artifact)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
        elif df[c].dtype == object:
            # array columns come back as ndarray/list — make them hashable
            df[c] = df[c].map(lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                              else tuple(v) if isinstance(v, list) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no Spark result parquet")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            if str(gv.dtype) != str(ev.dtype):
                bad_cols.append(f"{c}: dtype {gv.dtype} vs {ev.dtype}")
                continue
            if gv.dtype == object:
                eq = (gv.fillna("\0") == ev.fillna("\0")).all()
            elif np.issubdtype(gv.dtype, np.floating):
                eq = ((gv.isna() & ev.isna()) | (gv == ev)).all()
            else:
                eq = gv.equals(ev)
            if not eq:
                mism = None
                try:
                    neq = ~(((gv.isna()) & (ev.isna())) | (gv == ev))
                    i = int(np.argmax(neq.values))
                    mism = f" first diff @{i}: {gv.iloc[i]!r} vs {ev.iloc[i]!r}"
                except Exception:
                    pass
                bad_cols.append(f"{c}{mism or ''}")
        if bad_cols:
            print(f"FAIL {name}: value mismatch: {'; '.join(bad_cols[:4])}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
