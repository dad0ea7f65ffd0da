#!/usr/bin/env python3
"""Second-engine read probe: can the oracle's DuckDB load its `iceberg`
extension and scan a graft-committed table?

The reference's bar for foreign-reader interop is a real second engine
reading tables the catalog committed (reference
tests/python/tests/test_pyiceberg.py:6-98 — pyiceberg reads a table the
Rust server created). pyiceberg is not installable in this sandbox
(zero egress); DuckDB ships in the oracle toolchain, so its `iceberg`
extension is the one candidate foreign reader.

Run:  python3 tools/duckdb_iceberg_probe.py <table_location> [expected_parquet]

 - If INSTALL/LOAD succeed: iceberg_scan(<table_location>) and, when an
   expected parquet is given, hash-compare the two result sets. Exit 0
   on match, 2 on mismatch.
 - If the extension cannot load (offline sandbox): write the verbatim
   rejection to tools/DUCKDB_ICEBERG_REJECTION.txt and exit 3. The
   committed rejection file is the proof-of-attempt; the byte-golden
   fixtures in src/test/resources/goldens/avro/ (IcebergAvroGoldenSpec)
   are the offline fallback that makes writer drift detectable.
"""
import sys
import os

import duckdb


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    con = duckdb.connect()
    try:
        con.execute("INSTALL iceberg")
        con.execute("LOAD iceberg")
    except Exception as e:
        msg = (
            f"duckdb=={duckdb.__version__}: iceberg extension unavailable "
            f"offline.\n{type(e).__name__}: {e}\n"
        )
        out = os.path.join(here, "DUCKDB_ICEBERG_REJECTION.txt")
        with open(out, "w") as f:
            f.write(msg)
        print(msg, file=sys.stderr)
        print(f"[probe] rejection vendored at {out}; "
              "falling back to byte-golden fixtures (IcebergAvroGoldenSpec)")
        return 3

    if len(sys.argv) < 2:
        print("usage: duckdb_iceberg_probe.py <table_location> [expected_parquet]",
              file=sys.stderr)
        return 1
    loc = sys.argv[1]
    rows = con.execute(
        "SELECT * FROM iceberg_scan(?) ORDER BY ALL", [loc]).fetchall()
    print(f"[probe] iceberg_scan({loc}) -> {len(rows)} rows")
    if len(sys.argv) > 2:
        expected = con.execute(
            "SELECT * FROM read_parquet(?) ORDER BY ALL",
            [sys.argv[2]]).fetchall()
        if rows != expected:
            print(f"[probe] MISMATCH: iceberg_scan={len(rows)} rows, "
                  f"expected={len(expected)} rows", file=sys.stderr)
            return 2
        print("[probe] MATCH against expected parquet")
    return 0


if __name__ == "__main__":
    sys.exit(main())
