#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Runs DuckDB on each oracle_sql.json entry over the sf tables and compares
against the Verify-dumped parquet (columns sorted by name, rows sorted,
exact value equality). A FAILing compare is retried ONCE against a FRESH
DuckDB connection before being declared a FAIL — DuckDB evaluating next
to a 32-core Spark job has produced one-off wrong scalars under load
(r12's q306: engine==oracle on re-evaluation), and a single fresh-state
retry kills exactly that flake class while double-confirming real bugs.
Both attempts are logged. Usage:
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

def make_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con

def compare(got, exp):
    """None if equal under the gate's normalization, else a mismatch message."""
    g, e = norm(got), norm(exp)
    if list(g.columns) != list(e.columns):
        return f"columns {list(g.columns)} vs {list(e.columns)}"
    if len(g) != len(e):
        return f"rows {len(g)} vs {len(e)}"
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
    return f"value mismatch: {'; '.join(bad_cols[:4])}" if bad_cols else None

def check_one(name, sql, got, evaluate):
    """Evaluate the oracle and compare, retrying ONCE on a fresh evaluator.

    evaluate(sql, fresh) -> DataFrame; fresh=True means "use a brand-new
    connection" (injectable so the retry path is unit-testable). Returns
    (ok, message) with both attempts described on a retried query.
    """
    attempts = []
    for fresh in (False, True):
        try:
            exp = evaluate(sql, fresh)
        except Exception as e:
            attempts.append(f"oracle SQL error: {e}")
            break  # a SQL error is deterministic — no point retrying
        msg = compare(got, exp)
        if msg is None:
            if attempts:
                return True, f"ok on fresh-connection retry (attempt 1: {attempts[0]})"
            return True, None
        attempts.append(msg)
    return False, " | then retry: ".join(attempts)

def main(sf_dir, out_dir):
    con = make_con(sf_dir)

    def evaluate(sql, fresh):
        if fresh:
            # keep a live reference until .df() materializes: the inline
            # form make_con(...).sql(sql).df() lets Python GC the
            # connection mid-query ("Connection has already been closed")
            c2 = make_con(sf_dir)
            try:
                return c2.sql(sql).df()
            finally:
                c2.close()
        return con.sql(sql).df()

    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no Spark result parquet")
            n_bad += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        ok, msg = check_one(name, sql, got, evaluate)
        if ok:
            note = f" [{msg}]" if msg else ""
            print(f"ok   {name} ({len(got)} rows){note}")
            n_ok += 1
        else:
            print(f"FAIL {name}: {msg}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
