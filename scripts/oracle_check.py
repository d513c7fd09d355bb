#!/usr/bin/env python3
"""Local pre-validation of SparkEntry queries against the DuckDB oracle,
mimicking the driver's t2 gate: for each query, load Verify's parquet dump
and compare with DuckDB executing the oracle SQL on the fixture tables.

Usage: oracle_check.py <sfDir> <outDir>
(run Verify first: sbt "runMain graft.Verify <sfDir> <outDir>")

Compare semantics (strictest plausible driver behavior): columns sorted by
name, values compared exactly, both in produced row order and sorted row
order. Exit 1 on any mismatch.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_result(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])

def norm(table):
    """pyarrow table -> (schema_desc, list of row tuples) with cols sorted by name."""
    cols = sorted(table.column_names)
    table = table.select(cols)
    pydict = table.to_pydict()
    rows = list(zip(*[pydict[c] for c in cols])) if cols else []
    return cols, rows

def canon(v):
    # unify float/decimal/timestamp representations across engines
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("ts", datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, list):
        return ("list", tuple(canon(x) for x in v))
    return (type(v).__name__, v)

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    failures = []
    for name, sql in sorted(oracle.items()):
        res = load_result(outdir, name)
        if res is None:
            failures.append((name, "NO SPARK OUTPUT (query failed in Verify?)"))
            continue
        try:
            oracle_tbl = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            failures.append((name, f"ORACLE SQL ERROR: {e}"))
            continue
        scols, srows = norm(res)
        ocols, orows = norm(oracle_tbl)
        if scols != [c for c in ocols]:
            failures.append((name, f"SCHEMA: spark={scols} oracle={ocols}"))
            continue
        if len(srows) != len(orows):
            failures.append((name, f"ROWCOUNT: spark={len(srows)} oracle={len(orows)}"))
            continue
        sc = [tuple(canon(v) for v in r) for r in srows]
        oc = [tuple(canon(v) for v in r) for r in orows]
        if sc != oc:
            if sorted(sc) == sorted(oc):
                failures.append((name, "ROW ORDER differs (values match when sorted)"))
            else:
                diff = [(a, b) for a, b in zip(sc, oc) if a != b][:3]
                only_s = [r for r in sc if r not in oc][:2]
                failures.append((name, f"VALUES differ; first diffs={diff} spark-only={only_s}"))
            continue
        print(f"  OK  {name} ({len(srows)} rows)")
    # queries without oracle entries: report presence only
    for d in sorted(os.listdir(outdir)):
        if os.path.isdir(os.path.join(outdir, d)) and d not in oracle:
            n = load_result(outdir, d)
            print(f"  --  {d} (no oracle, {0 if n is None else n.num_rows} rows)")
    if failures:
        print(f"\n{len(failures)} FAILURES:")
        for name, msg in failures:
            print(f"  FAIL {name}: {msg}")
        sys.exit(1)
    print(f"\nall {len(oracle)} oracle queries match")

if __name__ == "__main__":
    main()
