#!/usr/bin/env python3
"""Unit test for check.py's one-retry-on-fresh-connection flake guard.

Forces a flake: the first oracle evaluation returns a wrong scalar, the
fresh-connection retry returns the right one — the query must grade ok,
and the ok message must record the first attempt. Also asserts that a
DETERMINISTIC mismatch (both attempts wrong) still FAILs with both
attempts logged, and that a SQL error is not retried.
Run: python3 tools/test_check_retry.py
"""
import pandas as pd
from check import check_one

GOT = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
RIGHT = pd.DataFrame({"k": [1, 2], "v": [10, 20]})
WRONG = pd.DataFrame({"k": [1, 2], "v": [10, 2102]})


def test_flake_killed_by_retry():
    calls = []
    def evaluate(sql, fresh):
        calls.append(fresh)
        return WRONG if not fresh else RIGHT
    ok, msg = check_one("q_flake", "SELECT 1", GOT, evaluate)
    assert ok, f"flaky oracle should pass on retry, got: {msg}"
    assert calls == [False, True], f"expected one stale + one fresh eval, got {calls}"
    assert "retry" in msg and "2102" in msg, f"ok message must log attempt 1: {msg}"


def test_real_mismatch_still_fails():
    def evaluate(sql, fresh):
        return WRONG
    ok, msg = check_one("q_real", "SELECT 1", GOT, evaluate)
    assert not ok
    assert msg.count("2102") == 2, f"both attempts must be logged: {msg}"


def test_sql_error_not_retried():
    calls = []
    def evaluate(sql, fresh):
        calls.append(fresh)
        raise RuntimeError("syntax error")
    ok, msg = check_one("q_err", "SELEC 1", GOT, evaluate)
    assert not ok and "syntax error" in msg
    assert calls == [False], f"deterministic SQL errors must not retry, got {calls}"


def test_clean_pass_single_attempt():
    calls = []
    def evaluate(sql, fresh):
        calls.append(fresh)
        return RIGHT
    ok, msg = check_one("q_ok", "SELECT 1", GOT, evaluate)
    assert ok and msg is None
    assert calls == [False]


def test_fresh_evaluator_survives_gc():
    # regression: main()'s fresh path once built the connection inline
    # (make_con(...).sql(sql).df()), letting Python GC close it before
    # .df() materialized — the retry then errored with "Connection has
    # already been closed" instead of re-evaluating. Drive main()'s REAL
    # duckdb evaluate on both paths.
    import tempfile, os, duckdb, check
    with tempfile.TemporaryDirectory() as d:
        con0 = duckdb.connect()
        for t in check.TABLES:
            con0.sql(f"COPY (SELECT 1 AS x) TO '{d}/{t}.parquet' (FORMAT PARQUET)")
        con0.close()
        con = check.make_con(d)
        def evaluate(sql, fresh):
            if fresh:
                c2 = check.make_con(d)
                try:
                    return c2.sql(sql).df()
                finally:
                    c2.close()
            return con.sql(sql).df()
        import gc
        for fresh in (False, True):
            got = evaluate("SELECT count(*) AS n FROM region", fresh)
            gc.collect()
            assert got["n"].iloc[0] == 1, (fresh, got)


if __name__ == "__main__":
    tests = (test_flake_killed_by_retry, test_real_mismatch_still_fails,
             test_sql_error_not_retried, test_clean_pass_single_attempt,
             test_fresh_evaluator_survives_gc)
    for t in tests:
        t()
        print(f"ok   {t.__name__}")
    print(f"\n{len(tests)} ok, 0 fail")
