#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with every
<sfDir>/<table>.parquet registered as a view, sorts columns by name and
rows by value, and compares cell-by-cell (exact for ints/strings,
bit-exact for floats — mirroring a value hash).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def selftest():
    """The gate must flag +0.0 vs -0.0 (the class the driver's bit hash
    catches). Exits 0 iff the bit compare sees the mismatch."""
    a = np.array([1.5, 0.0, float("nan")])
    b = np.array([1.5, -0.0, float("nan")])
    neq = a.view(np.int64) != b.view(np.int64)
    same_nan = not (np.array([float("nan")]).view(np.int64)
                    != np.array([float("nan")]).view(np.int64)).any()
    ok = bool(neq[1]) and not neq[0] and same_nan
    print("SELFTEST " + ("PASS: -0.0 vs +0.0 detected as mismatch" if ok
                         else "FAIL: signed zero NOT detected"))
    sys.exit(0 if ok else 1)

def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(t)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        pq_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(pq_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = norm(pd.concat([pd.read_parquet(f) for f in files]))
            duck_df = norm(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        ok = True
        msgs = []
        if list(spark_df.columns) != list(duck_df.columns):
            ok = False; msgs.append(f"columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        elif len(spark_df) != len(duck_df):
            ok = False; msgs.append(f"rows spark={len(spark_df)} duck={len(duck_df)}")
        else:
            for c in spark_df.columns:
                a, b = spark_df[c].values, duck_df[c].values
                try:
                    # Driver's hash is type-sensitive: a DuckDB HUGEINT sum
                    # arriving as float64 vs Spark int64 hash-mismatches even
                    # when every value is equal. Treat int-vs-float dtype
                    # disagreement as failure (fix: CAST(... AS BIGINT)).
                    a_f = np.issubdtype(a.dtype, np.floating)
                    b_f = np.issubdtype(b.dtype, np.floating)
                    if a_f != b_f:
                        ok = False
                        msgs.append(f"col {c}: dtype mismatch spark={a.dtype} duck={b.dtype} (cast oracle SUM/AVG to BIGINT/DOUBLE)")
                        continue
                    if a_f or b_f:
                        # BIT-exact, mirroring the driver's hash: compare the
                        # raw float64 bit patterns, so +0.0 vs -0.0 (and NaN
                        # payload differences) FAIL here exactly as they fail
                        # the driver. A value compare (==) is blind to the
                        # signed-zero class that round()-of-near-zero emits.
                        af = np.ascontiguousarray(a.astype(np.float64))
                        bf = np.ascontiguousarray(b.astype(np.float64))
                        neq = af.view(np.int64) != bf.view(np.int64)
                    else:
                        neq = np.array([str(x) != str(y) for x, y in zip(a, b)])
                except Exception as e:
                    ok = False; msgs.append(f"col {c}: compare error {e}"); continue
                if neq.any():
                    i = int(np.argmax(neq))
                    ok = False
                    msgs.append(f"col {c}: {int(neq.sum())} mismatches, first@{i}: spark={a[i]!r} duck={b[i]!r}")
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: " + "; ".join(msgs)); n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
