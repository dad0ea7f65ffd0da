#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB against the
parquet tables in <sfDir>, loads the Spark-written parquet result from
<verifyOutDir>/<name>/, sorts columns by name and rows by all columns,
and compares values exactly. Exit code 1 if any query mismatches.

This file is a dev tool only — the engine itself has no Python runtime
dependency.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # timestamps → ISO strings so tz-naive/aware and unit diffs don't bite
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    if len(df) and df.shape[1]:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (list, tuple)) or hasattr(a, "__len__") and not isinstance(a, str):
        try:
            la, lb = list(a), list(b)
            return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
        except TypeError:
            pass
    return a == b


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_fail = 0
    for name in sorted(oracle):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"FAIL {name}: no Spark output at {spark_path}")
            n_fail += 1
            continue
        try:
            want = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        got_files = [os.path.join(spark_path, f) for f in os.listdir(spark_path)
                     if f.endswith(".parquet")]
        got = norm(pd.concat([pd.read_parquet(f) for f in got_files],
                             ignore_index=True) if got_files else pd.DataFrame())

        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns differ spark={list(got.columns)} duckdb={list(want.columns)}")
            n_fail += 1
            continue
        # The driver hash-compares values; pandas int64 vs float64 hash
        # differently even when numerically equal (round-1 failure mode).
        kg = {c: got[c].dtype.kind for c in got.columns}
        kw = {c: want[c].dtype.kind for c in want.columns}
        if kg != kw:
            diff = {c: (kg[c], kw[c]) for c in kg if kg[c] != kw[c]}
            print(f"FAIL {name}: dtype kinds differ (spark, duckdb): {diff}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows differ spark={len(got)} duckdb={len(want)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not values_equal(got[c].iloc[i], want[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], want[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            i, c, g, w = bad
            print(f"FAIL {name}: row {i} col {c}: spark={g!r} duckdb={w!r}")
            n_fail += 1
        else:
            print(f"OK   {name}: {len(got)} rows")

    print(f"\n{len(oracle) - n_fail}/{len(oracle)} queries match")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
