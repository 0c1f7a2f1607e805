#!/usr/bin/env python3
"""oracle_check with a per-query wall budget, for corpora where the
exact O(n^2) oracles are infeasible (e.g. the 10x bench corpus: 50k
docs -> 2.5e9 candidate pairs in DuckDB).

Each query's DuckDB oracle + compare runs in a child process killed at
--timeout seconds (default 180); timeouts are reported as SKIP, never
PASS — the skipped set must be verified another way (for the 10x
replicated corpus: replication-invariance, tools/check_replication.py).

Usage: python3 tools/oracle_check_timeout.py <sfDir> <verifyOutDir> [--timeout N]
"""
import sys, os, json, glob
import multiprocessing as mp


def run_one(sf_dir, out_dir, name, sql, q):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import duckdb
    import pandas as pd
    import numpy as np
    from oracle_check import norm

    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        tname = os.path.basename(t)[: -len(".parquet")]
        con.execute(f"CREATE VIEW {tname} AS SELECT * FROM read_parquet('{t}')")
    files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
    if not files:
        q.put((name, "FAIL", "no spark output")); return
    try:
        spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
        duck_df = norm(con.execute(sql).df())
    except Exception as e:
        q.put((name, "FAIL", str(e)[:200])); return
    if list(spark_df.columns) != list(duck_df.columns):
        q.put((name, "FAIL",
               f"columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")); return
    if len(spark_df) != len(duck_df):
        q.put((name, "FAIL", f"rows spark={len(spark_df)} duck={len(duck_df)}")); return
    for c in spark_df.columns:
        a, b = spark_df[c].values, duck_df[c].values
        a_f = np.issubdtype(a.dtype, np.floating)
        b_f = np.issubdtype(b.dtype, np.floating)
        if a_f != b_f:
            q.put((name, "FAIL", f"col {c}: dtype mismatch {a.dtype} vs {b.dtype}")); return
        if a_f:
            af = np.ascontiguousarray(a.astype(np.float64))
            bf = np.ascontiguousarray(b.astype(np.float64))
            neq = af.view(np.int64) != bf.view(np.int64)
        else:
            neq = np.array([str(x) != str(y) for x, y in zip(a, b)])
        if neq.any():
            i = int(np.argmax(neq))
            q.put((name, "FAIL", f"col {c} row {i}: {a[i]} vs {b[i]}")); return
    q.put((name, "PASS", f"{len(spark_df)} rows"))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    budget = 180
    if "--timeout" in sys.argv:
        budget = int(sys.argv[sys.argv.index("--timeout") + 1])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    counts = {"PASS": 0, "FAIL": 0, "SKIP": 0}
    skipped, failed = [], []
    for name, sql in sorted(oracles.items()):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sf_dir, out_dir, name, sql, q))
        p.start(); p.join(budget)
        if p.is_alive():
            p.terminate(); p.join()
            print(f"SKIP {name} (oracle exceeded {budget}s)")
            counts["SKIP"] += 1; skipped.append(name); continue
        try:
            # join() does not guarantee the feeder pipe has drained into the
            # parent; a brief blocking get avoids a flaky false-FAIL.
            nm, status, msg = q.get(timeout=5)
        except Exception:
            print(f"FAIL {name}: oracle process died"); counts["FAIL"] += 1
            failed.append(name); continue
        print(f"{status} {nm} ({msg})")
        counts[status] += 1
        if status == "FAIL":
            failed.append(name)
    print(f"== {counts['PASS']} pass / {counts['FAIL']} fail / {counts['SKIP']} skip ==")
    if skipped:
        print("skipped:", ",".join(skipped))
    sys.exit(1 if counts["FAIL"] else 0)


if __name__ == "__main__":
    main()
