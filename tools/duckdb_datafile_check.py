#!/usr/bin/env python3
"""Foreign-reader check, data-file layer (r17): DuckDB — an independent
engine — reads the CURRENT data files of an engine-written table (as
listed by the engine's own `.files` metadata table) and compares the
row multiset against the engine's `SELECT *` dump.

Usage:
  sbt "runMain graft.ForeignReaderFixture /tmp/graft_foreign_reader"
  python3 tools/duckdb_datafile_check.py /tmp/graft_foreign_reader

Scope: append/compact tables (no row-level delete files — those need
delete application a raw parquet read cannot do). Validates: INT64
micros timestamps, decimals, dates, strings incl. empty/NULL, arrays
(incl. empty and NULL elements), structs (incl. NULL fields), and
partition source columns stored IN the files with special-char/unicode
partition values. (DuckDB also tolerates legacy INT96, so this check
pins the value-level contract; the r16 INT64 fix matters for parquet
stats and for spec-conformant readers like pyiceberg.)
"""
import json
import sys

import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_foreign_reader"
files = json.load(open(f"{out}/files.json"))
paths = [p[len("file:"):] if p.startswith("file:") else p for p in files]
con = duckdb.connect()
lst = ", ".join("'" + p.replace("'", "''") + "'" for p in paths)
cols = "id, ts, d, dec, s, arr, st, part"
ours = f"SELECT {cols} FROM read_parquet([{lst}], union_by_name=true)"
exp = f"SELECT {cols} FROM read_parquet('{out}/expected/*.parquet')"

n_ours = con.execute(f"SELECT count(*) FROM ({ours})").fetchone()[0]
n_exp = con.execute(f"SELECT count(*) FROM ({exp})").fetchone()[0]
extra = con.execute(
    f"SELECT count(*) FROM (({ours}) EXCEPT ALL ({exp}))").fetchone()[0]
missing = con.execute(
    f"SELECT count(*) FROM (({exp}) EXCEPT ALL ({ours}))").fetchone()[0]

print(f"[duckdb-datafile] files={len(paths)} rows(ours)={n_ours} "
      f"rows(expected)={n_exp} extra={extra} missing={missing}")
if n_ours == n_exp and extra == 0 and missing == 0 and n_ours > 0:
    print("[duckdb-datafile] PASS: DuckDB reads the engine's data files "
          "bit-equal to the engine's own scan")
    sys.exit(0)
for tag, q in (("extra", f"({ours}) EXCEPT ALL ({exp})"),
               ("missing", f"({exp}) EXCEPT ALL ({ours})")):
    rows = con.execute(f"SELECT * FROM ({q}) LIMIT 5").fetchall()
    for r in rows:
        print(f"[duckdb-datafile] {tag}: {r}")
print("[duckdb-datafile] FAIL")
sys.exit(1)
