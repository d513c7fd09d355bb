#!/usr/bin/env python3
"""Read a graft.operators.IndexManifest table from DuckDB — no Spark.

The point of a table format is that the METADATA, not the engine, owns
the table: any reader that can parse the log gets the same atomic
snapshot, the same zone-map file pruning, and the same merge-on-read
delete semantics. This script is that second engine, ~100 lines:

  1. resolve the current generation (or --gen N): walk the commit
     records back to the nearest full snapshot — a full manifest or a
     checkpoint-<g>.json sidecar — verifying the CRC32 body checksum of
     every record, then replay the delta tail (adds/removes/dv-adds);
  2. prune files whose clustering-column zone map cannot intersect the
     probe range [lo, hi] (statcols[0], declared in the manifest);
  3. plan the scan in DuckDB: read_parquet over exactly the kept files
     (hive partitioning for the partition column), residual BETWEEN
     filter, and an ANTI JOIN against the deletion-vector sidecars on
     (relative file path, file_row_number) — DuckDB's file_row_number
     is the same in-file ordinal Spark's _metadata.row_index exposes,
     because parquet row order is the file's physical order in both.

Prints one JSON object: {"generation","kept","skipped","rows":[[key,part],...]}
with rows sorted — ManifestInteropSpec compares it against Spark's
IndexManifest.readRange on the same tree. Exit 3 = duckdb unavailable
(spec cancels), exit 1 = integrity/protocol failure (spec fails).

Usage: manifest_interop.py <tableDir> <lo> <hi> [--gen N]
"""
import json
import os
import re
import sys
import zlib

try:
    import duckdb
except ImportError:
    print("duckdb module unavailable", file=sys.stderr)
    sys.exit(3)


def unescape(s):
    return re.sub("%([0-9a-fA-F]{4})", lambda m: chr(int(m.group(1), 16)), s)


def read_record(path, gen):
    raw = open(path, "rb").read().decode("utf-8")
    if raw.startswith('{"generation"'):  # v1: no checksum, stats-less
        body = json.loads(raw)
        assert body["generation"] == gen, f"{path}: generation mismatch"
        return {"kind": "full", "statcols": ["vec_id"], "part": "cell", "dvs": [],
                "files": [[unescape(p), -1, 0, -1] for p in body.get("files", [])]}
    doc = json.loads(raw)
    body_str = raw[raw.index('"body":') + 7:-1]
    crc = format(zlib.crc32(body_str.encode("utf-8")) & 0xFFFFFFFF, "08x")
    assert crc == doc["checksum"], f"{path}: checksum mismatch (torn write?)"
    b = doc["body"]
    assert b["version"] <= 3, f"{path}: version {b['version']} newer than this reader"
    assert b["generation"] == gen, f"{path}: generation mismatch"
    kind = b.get("kind", "full")  # v2 has no kind field: always full
    rec = {
        "kind": kind,
        "statcols": [unescape(c) for c in b.get("statcols", ["vec_id"])],
        "part": unescape(b.get("part", "cell")),
        "files": [[unescape(e[0])] + e[1:] for e in b.get("files", [])],
        "dvs": [[unescape(e[0]), e[1]] for e in b.get("dvs", [])],
        "removes": [unescape(p) for p in b.get("removes", [])],
        # name -> stable field id: the identity RENAMEs ride on — a file
        # written before a rename stores the column under its old name,
        # and its footer's field_id is what still binds it
        "fieldids": {unescape(e[0]): e[1] for e in b.get("fieldids", [])},
    }
    return rec


def resolve(md, gen):
    g, deltas = gen, []
    while True:
        cp = os.path.join(md, f"checkpoint-{g:09d}.json")
        mp = os.path.join(md, f"manifest-{g:09d}.json")
        if os.path.exists(cp):
            # a checkpoint is DERIVED data: a torn sidecar (crash on a
            # non-atomic-rename fs) falls back to the authoritative
            # commit chain, same as the Scala resolve()
            try:
                rec = read_record(cp, g)
            except (AssertionError, ValueError, KeyError):
                if not os.path.exists(mp):
                    raise
                print(f"warning: checkpoint for gen {g} unreadable, "
                      f"falling back to the commit chain", file=sys.stderr)
                rec = read_record(mp, g)
        else:
            rec = read_record(mp, g)
        if rec["kind"] == "full":
            state = rec
            break
        deltas.append(rec)
        g -= 1
        assert g >= 1, "delta chain has no full snapshot"
    for d in reversed(deltas):
        rm = set(d["removes"])
        state["files"] = [f for f in state["files"] if f[0] not in rm] + d["files"]
        state["dvs"] = state["dvs"] + d["dvs"]
        if d.get("fieldids"):  # schema evolution extends the id map
            state["fieldids"] = d["fieldids"]
    return state


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    table, lo, hi = args[0], int(args[1]), int(args[2])
    pinned, sumcol = None, None
    for a in sys.argv[1:]:
        if a.startswith("--gen="):
            pinned = int(a.split("=", 1)[1])
        if a.startswith("--sum="):
            sumcol = a.split("=", 1)[1]
    md = os.path.join(table, "_manifests")
    gens = sorted(int(m.group(1)) for n in os.listdir(md)
                  if (m := re.fullmatch(r"manifest-(\d{9})\.json", n)))
    gen = pinned if pinned is not None else gens[-1]
    st = resolve(md, gen)

    def overlaps(f):  # stats-less entries (rows<0 or min>max) are kept
        return f[1] < 0 or f[2] > f[3] or (f[2] <= hi and f[3] >= lo)

    kept = [f for f in st["files"] if overlaps(f)]
    skipped = len(st["files"]) - len(kept)
    key = st["statcols"][0]

    def sql_list(paths):
        return "[" + ",".join("'" + p.replace("'", "''") + "'" for p in paths) + "]"

    # RENAME RESOLUTION BY FIELD ID: when the manifest carries fieldids,
    # a file written before a rename stores the probed column under its
    # OLD physical name — parquet_schema() exposes each file's
    # (name, field_id) pairs, so the reader groups files by their
    # physical spelling of the needed logical columns and aliases each
    # group back to the manifest names. One metadata query per kept
    # file; files whose spelling already matches flow through the
    # single-scan path unchanged.
    needed = [key] + ([sumcol] if sumcol else [])
    wanted = {c: st["fieldids"][c] for c in needed if c in st.get("fieldids", {})}

    def physnames(path):
        rows = duckdb.sql(
            "SELECT name, field_id FROM parquet_schema('"
            + path.replace("'", "''") + "')").fetchall()
        by_id = {fid: n for n, fid in rows if fid is not None}
        names = {n for n, _ in rows}
        return {logical: by_id.get(fid, logical if logical in names else None)
                for logical, fid in wanted.items()}

    groups = {}
    if wanted:
        for f in kept:
            sig = tuple(sorted(physnames(os.path.join(table, f[0])).items()))
            groups.setdefault(sig, []).append(f)
    trivial = not groups or (len(groups) == 1 and
                             all(k == v for k, v in next(iter(groups))))

    def scan(files, mapping):
        sel = []
        for c in needed + [st["part"]]:
            phys = mapping.get(c, c)
            sel.append(f"NULL AS {c}" if phys is None
                       else (f"b.{phys} AS {c}" if phys != c else f"b.{c}"))
        # union_by_name: files written before a schema-evolved column
        # existed surface NULL for it — the same late-column semantics
        # Spark gets from the manifest-held schema
        return (f"SELECT {', '.join(sel)}, b.filename AS filename, "
                f"b.file_row_number AS file_row_number "
                f"FROM read_parquet({sql_list(os.path.join(table, f[0]) for f in files)}, "
                f"filename=true, file_row_number=true, hive_partitioning=true, "
                f"union_by_name=true) b")

    if trivial:
        src = scan(kept, {})
    else:
        src = " UNION ALL ".join(scan(fs, dict(sig)) for sig, fs in groups.items())
    sumsel = f", s.{sumcol} AS s" if sumcol else ""
    q = (f"SELECT s.{key} AS k, s.{st['part']} AS p{sumsel}, "
         f"regexp_extract(s.filename, '[^/]+/[^/]+$') AS f, "
         f"s.file_row_number AS i "
         f"FROM ({src}) s WHERE s.{key} BETWEEN {lo} AND {hi} ORDER BY k, p")
    fetched = duckdb.sql(q).fetchall()
    # deletion vectors: anti-join in python — sidecar keys are
    # URI-ENCODED (Spark's _metadata.file_path form: 'pt BR' → 'pt%20BR')
    # while DuckDB's filename is the raw on-disk name; urllib's unquote
    # (which, unlike form decoding, leaves '+' alone) bridges them.
    # Two sidecar formats, named by path: dv2- is compressed (one row per
    # touched file, positions = delta-varint binary — the ~10-line twin
    # of graft.operators.DvCodec), dv- is row-per-position pairs.
    def unvarint(buf):
        out, acc, i = [], 0, 0
        while i < len(buf):
            shift, d = 0, 0
            while True:
                b = buf[i]
                i += 1
                d |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            acc = d if not out else acc + d
            out.append(acc)
        return out

    deleted = set()
    if st["dvs"]:
        from urllib.parse import unquote
        packed = [d for d in st["dvs"] if d[0].startswith("_dv/dv2-")]
        legacy = [d for d in st["dvs"] if not d[0].startswith("_dv/dv2-")]
        if packed:
            dvq = (f"SELECT file, positions FROM read_parquet("
                   f"{sql_list(os.path.join(table, d[0], '*.parquet') for d in packed)})")
            for f, blob in duckdb.sql(dvq).fetchall():
                deleted.update((unquote(f), i) for i in unvarint(bytes(blob)))
        if legacy:
            dvq = (f"SELECT file, row_index FROM read_parquet("
                   f"{sql_list(os.path.join(table, d[0], '*.parquet') for d in legacy)})")
            deleted.update((unquote(f), i) for f, i in duckdb.sql(dvq).fetchall())
    live = [r for r in fetched if (r[-2], r[-1]) not in deleted]
    out = {"generation": gen, "kept": len(kept), "skipped": skipped,
           "rows": [[int(r[0]), str(r[1])] for r in live]}
    if sumcol:  # evolved-column probe: NULLs (pre-evolution files) ignored
        vals = [r[2] for r in live if r[2] is not None]
        out["sum"] = int(sum(vals)) if vals else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
