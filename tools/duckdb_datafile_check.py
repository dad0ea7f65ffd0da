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
import re
import sys

import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_foreign_reader"


def norm(p):
    return re.sub(r"^file:/*", "/", p)


def check_mor(con):
    """Part 2: MoR delete application, re-implemented per the Iceberg
    spec in DuckDB SQL over the raw files — position deletes by
    (file, row-number), equality deletes by IS NOT DISTINCT FROM over
    the file's equality columns applied to STRICTLY-OLDER data files
    (same-commit replacement rows must survive; NULL keys must match
    NULL rows)."""
    mor = json.load(open(f"{out}/mor/files.json"))
    data = [f for f in mor if f["content"] == "data"]
    pos = [f for f in mor if f["content"] == "position-deletes"]
    eq = [f for f in mor if f["content"] == "equality-deletes"]
    dlist = ", ".join("'" + norm(f["path"]) + "'" for f in data)
    seqv = ", ".join(f"('{norm(f['path'])}', {f['seq']})" for f in data)
    base = (f"SELECT d.id, d.k, d.v, d.filename AS fn, "
            f"d.file_row_number AS rn, m.seq AS dseq "
            f"FROM read_parquet([{dlist}], filename=true, "
            f"file_row_number=true, union_by_name=true) d "
            f"JOIN (VALUES {seqv}) m(p, seq) ON d.filename = m.p")
    conds = []
    if pos:
        plist = ", ".join("'" + norm(f["path"]) + "'" for f in pos)
        conds.append(
            f"NOT EXISTS (SELECT 1 FROM ("
            f"SELECT regexp_replace(file_path, '^file:/*', '/') AS fp, pos "
            f"FROM read_parquet([{plist}])) p "
            f"WHERE p.fp = s.fn AND p.pos = s.rn)")
    for f in eq:
        match = " AND ".join(
            f"e.{c} IS NOT DISTINCT FROM s.{c}" for c in f["cols"])
        conds.append(
            f"NOT (s.dseq < {f['seq']} AND EXISTS (SELECT 1 FROM "
            f"read_parquet('{norm(f['path'])}') e WHERE {match}))")
    where = " AND ".join(conds) if conds else "TRUE"
    ours = f"SELECT id, k, v FROM ({base}) s WHERE {where}"
    expm = f"SELECT id, k, v FROM read_parquet('{out}/mor/expected/*.parquet')"
    n_ours = con.execute(f"SELECT count(*) FROM ({ours})").fetchone()[0]
    n_exp = con.execute(f"SELECT count(*) FROM ({expm})").fetchone()[0]
    extra = con.execute(
        f"SELECT count(*) FROM (({ours}) EXCEPT ALL ({expm}))").fetchone()[0]
    missing = con.execute(
        f"SELECT count(*) FROM (({expm}) EXCEPT ALL ({ours}))").fetchone()[0]
    print(f"[duckdb-mor] data={len(data)} pos={len(pos)} eq={len(eq)} "
          f"rows(ours)={n_ours} rows(expected)={n_exp} "
          f"extra={extra} missing={missing}")
    if n_ours == n_exp and extra == 0 and missing == 0 and n_ours > 0:
        print("[duckdb-mor] PASS: DuckDB applies the engine's position + "
              "equality delete files (strictly-older scoping, NULL-key "
              "equality) to the engine's own answer")
        return True
    for tag, q in (("extra", f"({ours}) EXCEPT ALL ({expm})"),
                   ("missing", f"({expm}) EXCEPT ALL ({ours})")):
        for r in con.execute(f"SELECT * FROM ({q}) LIMIT 5").fetchall():
            print(f"[duckdb-mor] {tag}: {r}")
    print("[duckdb-mor] FAIL")
    return False
files = json.load(open(f"{out}/files.json"))
paths = [norm(p) for p in files]
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
part1 = n_ours == n_exp and extra == 0 and missing == 0 and n_ours > 0
if part1:
    print("[duckdb-datafile] PASS: DuckDB reads the engine's data files "
          "bit-equal to the engine's own scan")
else:
    for tag, q in (("extra", f"({ours}) EXCEPT ALL ({exp})"),
                   ("missing", f"({exp}) EXCEPT ALL ({ours})")):
        rows = con.execute(f"SELECT * FROM ({q}) LIMIT 5").fetchall()
        for r in rows:
            print(f"[duckdb-datafile] {tag}: {r}")
    print("[duckdb-datafile] FAIL")
part2 = check_mor(con)
sys.exit(0 if part1 and part2 else 1)
