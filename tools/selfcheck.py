#!/usr/bin/env python3
"""Dev-only oracle self-check (NOT part of the engine; mirrors the driver's
t2 gate). Reads the Verify output dir (per-query parquet + oracle_sql.json),
runs each oracle in DuckDB over the same sf tables, and compares
column-name-sorted, row-sorted values exactly.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Float semantics are BYTE-LEVEL (round-9 hardening): the driver's
pandas-based hasher hashes the raw float64 bytes, so -0.0 and +0.0 —
equal under ==, equal under the old `v + 0.0` collapse — hash
DIFFERENTLY. Round 8's q77 was selfcheck-green / driver-red for two
rounds on exactly one such entry. This mirror now compares
struct-packed IEEE bytes, making it at least as strict as the driver:
selfcheck-green => driver-green. (NaN keeps a single canonical token:
parquet/duckdb both emit the quiet-NaN pattern, and a non-canonical
NaN payload surviving a parquet roundtrip would be an engine bug this
dev tool shouldn't mask as a value diff.)
"""
import json, math, os, struct, sys
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows lexicographically by repr
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple(map(repr, t)))
    return [cols[i] for i in order], out

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # byte-exact: distinguishes -0.0 from +0.0 like the driver does
        return struct.pack("<d", v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Optional cap so concurrent gate runs can't OOM each other (the
    # round-10 main-set run died at 50 GB RSS beside two 40 GB family
    # passes); DuckDB spills to temp disk past the cap instead.
    limit = os.environ.get("SELFCHECK_MEM_LIMIT")
    if limit:
        con.execute(f"SET memory_limit='{limit}'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            gcols, grows = canon(got.fetchall(), got.columns)
            exp = con.sql(sql)
            ecols, erows = canon(exp.fetchall(), exp.columns)
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        if gcols != ecols:
            print(f"FAIL {name}: columns {gcols} != {ecols}")
            n_fail += 1
            continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rowcount {len(grows)} != {len(erows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(grows)} rows differ; first at {i}:")
            print(f"  spark : {a}")
            print(f"  duckdb: {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
