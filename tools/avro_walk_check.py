#!/usr/bin/env python3
"""Foreign-reader check, AVRO METADATA layer (r18): an INDEPENDENT,
dependency-free decoder of the Avro object-container format — written
from the public Avro 1.12 spec, no avro library — walks the engine's
Iceberg metadata chain

    metadata.json -> manifest list (avro) -> manifests (avro)
                  -> data/delete file paths, partition tuples,
                     sequence numbers, field-id-keyed stats

and cross-checks every layer three ways:
  1. against the ENGINE's own claims (walk.json: planFiles() paths,
     content kinds, data sequence numbers, record counts, partition
     tuples, equality ids, schema field ids);
  2. against DUCKDB-computed truths from the raw parquet files
     (record counts, per-field null counts, lower/upper bounds
     decoded per spec Appendix D, partition values vs the partition
     source column stored in the files);
  3. by feeding the walked file inventory into the same row-multiset
     comparisons as tools/duckdb_datafile_check.py — including the
     MoR delete application (position + equality + strictly-older
     sequence scoping) driven ENTIRELY by walker-derived inputs.

This closes the "conformance-vs-the-same-library" gap: the engine
writes its avro twins with Apache Avro 1.12.1, and until r18 the only
reader of those bytes was that same library. This decoder shares no
code with it (container framing, zigzag varints, block/codec handling,
schema-driven datum decoding are all re-implemented from the published
spec), so a passing walk is genuinely independent evidence, fully
offline.

Usage:
  sbt "runMain graft.ForeignReaderFixture /tmp/graft_foreign_reader"
  python3 tools/avro_walk_check.py /tmp/graft_foreign_reader

(duckdb is a dev-tool dependency of the CHECKER only, never of the
library; the avro decoding itself is stdlib-only.)
"""
import gzip
import io
import json
import re
import struct
import sys
import zlib

import duckdb

out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_foreign_reader"
failures = []


def check(ok, msg):
    tag = "ok" if ok else "FAIL"
    print(f"[avro-walk] {tag}: {msg}")
    if not ok:
        failures.append(msg)


def norm(p):
    return re.sub(r"^file:/*", "/", p)


# ----------------------------------------------------------------------
# Avro object-container + datum decoding, from the spec. No avro import.
# ----------------------------------------------------------------------
class Reader:
    def __init__(self, buf):
        self.buf = buf
        self.pos = 0

    def read(self, n):
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise EOFError(f"wanted {n} bytes at {self.pos}")
        self.pos += n
        return b

    def at_end(self):
        return self.pos >= len(self.buf)

    def zlong(self):
        """Variable-length zig-zag long (spec: binary encoding)."""
        shift, acc = 0, 0
        while True:
            b = self.read(1)[0]
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def zbytes(self):
        return self.read(self.zlong())

    def zstring(self):
        return self.zbytes().decode("utf-8")


def decode_datum(r, schema, named):
    """Schema-driven datum decode (spec: binary encoding). `named`
    resolves record/fixed/enum name references."""
    if isinstance(schema, str):
        t = schema
        if t in named:
            return decode_datum(r, named[t], named)
        if t == "null":
            return None
        if t == "boolean":
            return r.read(1)[0] == 1
        if t in ("int", "long"):
            return r.zlong()
        if t == "float":
            return struct.unpack("<f", r.read(4))[0]
        if t == "double":
            return struct.unpack("<d", r.read(8))[0]
        if t == "bytes":
            return r.zbytes()
        if t == "string":
            return r.zstring()
        raise ValueError(f"unknown primitive {t}")
    if isinstance(schema, list):  # union: long index, then branch
        return decode_datum(r, schema[r.zlong()], named)
    t = schema["type"]
    if t == "record":
        # register by full name for self/forward references
        named[schema.get("name", "")] = schema
        return {f["name"]: decode_datum(r, f["type"], named)
                for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.zlong()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        items = []
        while True:
            n = r.zlong()
            if n == 0:
                return items
            if n < 0:  # block with byte size prefix
                n = -n
                r.zlong()
            for _ in range(n):
                items.append(decode_datum(r, schema["items"], named))
    if t == "map":
        m = {}
        while True:
            n = r.zlong()
            if n == 0:
                return m
            if n < 0:
                n = -n
                r.zlong()
            for _ in range(n):
                k = r.zstring()  # key MUST decode before the value
                m[k] = decode_datum(r, schema["values"], named)
    # logical types etc. ride on an inner "type"
    return decode_datum(r, t, named)


def read_container(path):
    """Avro object-container file -> (metadata dict, [records])."""
    raw = open(norm(path), "rb").read()
    r = Reader(raw)
    if r.read(4) != b"Obj\x01":
        raise ValueError(f"{path}: bad avro magic")
    meta = {}
    while True:  # file metadata is a map<string, bytes>
        n = r.zlong()
        if n == 0:
            break
        if n < 0:
            n = -n
            r.zlong()
        for _ in range(n):
            k = r.zstring()  # key MUST decode before the value (python
            meta[k] = r.zbytes()  # evaluates subscript RHS first)
    sync = r.read(16)
    codec = meta.get("avro.codec", b"null").decode()
    schema = json.loads(meta["avro.schema"].decode())
    records = []
    while not r.at_end():
        count = r.zlong()
        payload = r.zbytes()
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"{path}: unsupported codec {codec}")
        if r.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
        br = Reader(payload)
        for _ in range(count):
            records.append(decode_datum(br, schema, {}))
        if not br.at_end():
            raise ValueError(f"{path}: {br.pos}/{len(payload)} trailing bytes")
    return meta, records


def int_map(v):
    """Iceberg's int-keyed map rides as array<{key,value}> with a map
    logical type — normalize to a python dict."""
    if v is None:
        return {}
    return {e["key"]: e["value"] for e in v}


def read_json_maybe_gz(path):
    raw = open(norm(path), "rb").read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    return json.loads(raw.decode("utf-8"))


# ----------------------------------------------------------------------
# The walk: metadata.json -> manifest list -> manifests -> files
# ----------------------------------------------------------------------
def walk_files(meta, snap_id):
    """Walk ONE snapshot's avro manifest list -> manifests -> live
    file inventory (works for any snapshot in the metadata, current or
    historical — time travel through the walked layer)."""
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == snap_id)
    # the engine-native list is JSON; its spec avro twin sits at the
    # documented sibling path snap-<id>-manifest-list.avro (the layout
    # contract in graft.engine.Manifests)
    list_path = re.sub(r"snap-(-?\d+)\.json$",
                       r"snap-\1-manifest-list.avro", snap["manifest-list"])
    lmeta, manifests = read_container(list_path)
    check(int(lmeta["snapshot-id"].decode()) == snap_id,
          f"manifest list self-identifies snapshot {snap_id}")
    files = []
    for mf in manifests:
        _, entries = read_container(mf["manifest_path"])
        for e in entries:
            if e["status"] == 2:  # DELETED: not live in this snapshot
                continue
            df = e["data_file"]
            seq = e["sequence_number"]
            if seq is None:
                # spec inheritance: null data sequence number on an
                # ADDED entry inherits the manifest's sequence number
                check(e["status"] == 1,
                      f"{df['file_path']}: null seq only legal on ADDED")
                seq = mf["sequence_number"]
            files.append({
                "path": df["file_path"],
                "content": df["content"],
                "seq": seq,
                "record_count": df["record_count"],
                "partition": df.get("partition") or {},
                "equality_ids": df.get("equality_ids") or [],
                "null_value_counts": int_map(df.get("null_value_counts")),
                "lower_bounds": int_map(df.get("lower_bounds")),
                "upper_bounds": int_map(df.get("upper_bounds")),
            })
    return files


def walk_table(claims):
    """Walk one table's avro metadata chain from its metadata.json.
    Returns (walked file list, schema name->id map, types by id)."""
    meta = read_json_maybe_gz(claims["metadata_location"])
    cur_snap = meta["current-snapshot-id"]
    check(cur_snap == claims["current_snapshot_id"],
          f"metadata.json current-snapshot-id {cur_snap} == engine claim")
    schema = next(s for s in meta["schemas"]
                  if s["schema-id"] == meta["current-schema-id"])
    name_to_id = {f["name"]: f["id"] for f in schema["fields"]}
    types_by_id = {f["id"]: f["type"] for f in schema["fields"]}
    check(name_to_id == claims["field_ids"],
          f"schema field ids {sorted(name_to_id.items())} == engine claim")
    return walk_files(meta, cur_snap), name_to_id, types_by_id


CONTENT_NAMES = {0: "data", 1: "position-deletes", 2: "equality-deletes"}


def check_against_engine(name, walked, claims):
    """Layer 1: the walked inventory equals the engine's planFiles()."""
    by_path = {f["path"]: f for f in walked}
    claimed = {f["path"]: f for f in claims["files"]}
    check(sorted(by_path) == sorted(claimed),
          f"{name}: walked file set == engine planFiles "
          f"({len(by_path)} files)")
    for p, c in claimed.items():
        w = by_path.get(p)
        if w is None:
            continue
        check(CONTENT_NAMES[w["content"]] == c["content"],
              f"{name}: content of {p.rsplit('/', 1)[-1]}")
        check(w["seq"] == c["seq"],
              f"{name}: data sequence number {w['seq']} of "
              f"{p.rsplit('/', 1)[-1]}")
        check(w["record_count"] == c["record_count"],
              f"{name}: record count {w['record_count']} of "
              f"{p.rsplit('/', 1)[-1]}")
        check(sorted(w["equality_ids"]) == sorted(c["equality_ids"]),
              f"{name}: equality ids of {p.rsplit('/', 1)[-1]}")
        walked_part = {k: ("null" if v is None else str(v))
                       for k, v in w["partition"].items()}
        claimed_part = {k: v for k, v in c["partition"].items()}
        check(walked_part == claimed_part or (
              not claimed_part and not any(
                  v != "null" for v in walked_part.values())),
              f"{name}: partition tuple {walked_part} of "
              f"{p.rsplit('/', 1)[-1]} == engine claim {claimed_part}")


def decode_bound(raw, ice_type):
    """Spec Appendix D single-value binary -> python value."""
    if isinstance(ice_type, str) and ice_type.startswith("decimal"):
        m = re.match(r"decimal\((\d+),\s*(\d+)\)", ice_type)
        scale = int(m.group(2))
        unscaled = int.from_bytes(raw, "big", signed=True)
        return unscaled, scale
    if ice_type in ("int", "date"):
        return struct.unpack("<i", raw)[0]
    if ice_type in ("long", "time", "timestamp", "timestamptz"):
        return struct.unpack("<q", raw)[0]
    if ice_type == "float":
        return struct.unpack("<f", raw)[0]
    if ice_type == "double":
        return struct.unpack("<d", raw)[0]
    if ice_type in ("string", "uuid"):
        return raw.decode("utf-8")
    if ice_type == "boolean":
        return raw[0] == 1
    return None


def check_against_duckdb(con, walked, name_to_id, types_by_id):
    """Layer 2: per-file truths recomputed by DuckDB from the raw
    parquet — record counts, null counts per field id, Appendix-D
    bounds, and the partition tuple vs the stored source column."""
    for f in (f for f in walked if f["content"] == 0):
        p = norm(f["path"])
        short = p.rsplit("/", 1)[-1]
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{p}')").fetchone()[0]
        check(n == f["record_count"], f"record_count {n} of {short}")
        for col, fid in name_to_id.items():
            if fid in f["null_value_counts"]:
                nn = con.execute(
                    f'SELECT count(*) FROM read_parquet(\'{p}\') '
                    f'WHERE "{col}" IS NULL').fetchone()[0]
                check(nn == f["null_value_counts"][fid],
                      f"null count of {col} ({nn}) in {short}")
        for col, fid in name_to_id.items():
            t = types_by_id[fid]
            if not isinstance(t, str):
                continue  # nested types carry no flat bounds
            for tag, bounds, agg in (("lower", f["lower_bounds"], "min"),
                                     ("upper", f["upper_bounds"], "max")):
                if fid not in bounds:
                    continue
                got = decode_bound(bounds[fid], t)
                if got is None:
                    continue
                if isinstance(t, str) and t.startswith("decimal"):
                    unscaled, scale = got
                    truth = con.execute(
                        f'SELECT CAST({agg}("{col}") * {10 ** scale} AS '
                        f'HUGEINT) FROM read_parquet(\'{p}\')').fetchone()[0]
                    check(int(truth) == unscaled,
                          f"{tag} bound of {col} in {short} "
                          f"(unscaled {unscaled})")
                elif t in ("timestamp", "timestamptz"):
                    truth = con.execute(
                        f'SELECT epoch_us({agg}("{col}")) '
                        f'FROM read_parquet(\'{p}\')').fetchone()[0]
                    check(truth == got,
                          f"{tag} bound of {col} in {short} ({got} us)")
                elif t == "date":
                    truth = con.execute(
                        f'SELECT CAST({agg}("{col}") - DATE \'1970-01-01\' '
                        f'AS INT) FROM read_parquet(\'{p}\')').fetchone()[0]
                    check(truth == got,
                          f"{tag} bound of {col} in {short} (day {got})")
                elif t in ("int", "long", "string", "boolean"):
                    truth = con.execute(
                        f'SELECT {agg}("{col}") '
                        f'FROM read_parquet(\'{p}\')').fetchone()[0]
                    # string bounds may be truncated prefixes per spec;
                    # lower must be <= truth, upper >= truth prefix-wise
                    if t == "string" and truth is not None:
                        ok = (got <= truth if tag == "lower"
                              else got >= truth or truth.startswith(got))
                        check(ok, f"{tag} bound of {col} in {short}")
                    else:
                        check(truth == got,
                              f"{tag} bound of {col} in {short} ({got})")
        # identity partition tuple == distinct stored source value
        for pname, pval in f["partition"].items():
            if pname in name_to_id:  # identity transform keeps the name
                vals = [r[0] for r in con.execute(
                    f'SELECT DISTINCT "{pname}" '
                    f'FROM read_parquet(\'{p}\')').fetchall()]
                check(vals == [pval],
                      f"partition {pname}={pval!r} of {short} matches "
                      f"the stored source column {vals!r}")


def check_rows_t(con, walked):
    """Layer 3a: walked data files -> same row multiset as the engine's
    SELECT * dump (append/compact table)."""
    paths = sorted(norm(f["path"]) for f in walked if f["content"] == 0)
    lst = ", ".join("'" + p.replace("'", "''") + "'" for p in paths)
    cols = "id, ts, d, dec, s, arr, st, part"
    ours = f"SELECT {cols} FROM read_parquet([{lst}], union_by_name=true)"
    exp = f"SELECT {cols} FROM read_parquet('{out}/expected/*.parquet')"
    extra = con.execute(
        f"SELECT count(*) FROM (({ours}) EXCEPT ALL ({exp}))").fetchone()[0]
    missing = con.execute(
        f"SELECT count(*) FROM (({exp}) EXCEPT ALL ({ours}))").fetchone()[0]
    n = con.execute(f"SELECT count(*) FROM ({ours})").fetchone()[0]
    check(extra == 0 and missing == 0 and n > 0,
          f"t: row multiset from WALKED files == engine SELECT * "
          f"({n} rows, extra={extra}, missing={missing})")


def check_rows_t2(con, walked, name_to_id):
    """Layer 3b: the MoR delete application driven entirely by
    walker-derived inputs (paths, contents, seqs, equality ids)."""
    id_to_name = {v: k for k, v in name_to_id.items()}
    data = [f for f in walked if f["content"] == 0]
    pos = [f for f in walked if f["content"] == 1]
    eq = [f for f in walked if f["content"] == 2]
    check(len(pos) > 0 and len(eq) > 0,
          f"t2: walk finds MoR delete files (pos={len(pos)}, eq={len(eq)})")
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
        cols = [id_to_name[i] for i in f["equality_ids"]]
        match = " AND ".join(
            f"e.{c} IS NOT DISTINCT FROM s.{c}" for c in cols)
        conds.append(
            f"NOT (s.dseq < {f['seq']} AND EXISTS (SELECT 1 FROM "
            f"read_parquet('{norm(f['path'])}') e WHERE {match}))")
    where = " AND ".join(conds) if conds else "TRUE"
    ours = f"SELECT id, k, v FROM ({base}) s WHERE {where}"
    expm = f"SELECT id, k, v FROM read_parquet('{out}/mor/expected/*.parquet')"
    extra = con.execute(
        f"SELECT count(*) FROM (({ours}) EXCEPT ALL ({expm}))").fetchone()[0]
    missing = con.execute(
        f"SELECT count(*) FROM (({expm}) EXCEPT ALL ({ours}))").fetchone()[0]
    n = con.execute(f"SELECT count(*) FROM ({ours})").fetchone()[0]
    check(extra == 0 and missing == 0 and n > 0,
          f"t2: MoR row multiset from WALKED metadata == engine SELECT * "
          f"({n} rows, extra={extra}, missing={missing})")


def check_historical(con, walk):
    """Time travel through the WALKED layer: a non-current snapshot's
    own avro manifest list must reproduce the engine's snapshot-pinned
    scan — the historical metadata stays walkable, not just the head."""
    h = walk["historical"]
    meta = read_json_maybe_gz(walk[h["table"]]["metadata_location"])
    check(h["snapshot_id"] != meta["current-snapshot-id"],
          f"historical snapshot {h['snapshot_id']} is NOT the current one")
    files = walk_files(meta, h["snapshot_id"])
    paths = sorted(norm(f["path"]) for f in files if f["content"] == 0)
    lst = ", ".join("'" + p.replace("'", "''") + "'" for p in paths)
    cols = "id, ts, d, dec, s, arr, st, part"
    ours = f"SELECT {cols} FROM read_parquet([{lst}], union_by_name=true)"
    exp = (f"SELECT {cols} FROM "
           f"read_parquet('{out}/{h['expected_dir']}/*.parquet')")
    extra = con.execute(
        f"SELECT count(*) FROM (({ours}) EXCEPT ALL ({exp}))").fetchone()[0]
    missing = con.execute(
        f"SELECT count(*) FROM (({exp}) EXCEPT ALL ({ours}))").fetchone()[0]
    n = con.execute(f"SELECT count(*) FROM ({ours})").fetchone()[0]
    check(extra == 0 and missing == 0 and n > 0,
          f"historical snapshot {h['snapshot_id']} ({len(paths)} files): "
          f"row multiset from its WALKED manifest list == engine "
          f"VERSION AS OF ({n} rows, extra={extra}, missing={missing})")


def main():
    walk = json.load(open(f"{out}/walk.json"))
    con = duckdb.connect()
    for name in ("t", "t2"):
        claims = walk[name]
        walked, name_to_id, types_by_id = walk_table(claims)
        print(f"[avro-walk] {name}: walked {len(walked)} live files from "
              f"{claims['metadata_location'].rsplit('/', 1)[-1]}")
        check_against_engine(name, walked, claims)
        check_against_duckdb(con, walked, name_to_id, types_by_id)
        if name == "t":
            check_rows_t(con, walked)
        else:
            check_rows_t2(con, walked, name_to_id)
    if "historical" in walk:
        check_historical(con, walk)
    if failures:
        print(f"[avro-walk] FAIL ({len(failures)} checks failed)")
        sys.exit(1)
    print("[avro-walk] PASS: a from-the-spec avro decoder independently "
          "walks metadata.json -> manifest list -> manifests -> files "
          "(field ids, partition tuples, sequence numbers, Appendix-D "
          "bounds) and reproduces both tables' row multisets, incl. the "
          "MoR delete layer, from walked metadata alone")


if __name__ == "__main__":
    main()
