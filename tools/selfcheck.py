#!/usr/bin/env python3
"""Dev-only self-check harness (NOT part of the shipped library).

Emulates the driver's correctness gate: runs graft.Verify at a given SF,
then executes each oracle SQL in DuckDB over the same parquet tables and
compares results (schema, row count, values) with rows sorted and
columns sorted by name.

Usage: python3 tools/selfcheck.py [sfdir] [outdir] [namePrefixCsv]
"""
import json, math, sys, subprocess, glob, os

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
FILTER = sys.argv[3] if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    r = subprocess.run(
        ["sbt", f'runMain graft.Verify {SF} {OUT}' + (f" {FILTER}" if FILTER else "")],
        capture_output=True, text=True, cwd="/root/repo")
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:])
        sys.exit("verify failed")
    for line in r.stdout.splitlines():
        if "[verify]" in line:
            print(line)


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, int):
        return float(v) if abs(v) < 2**52 else v
    return str(v)


def frame_key(df):
    import pandas as pd
    cols = sorted(df.columns)
    rows = []
    for t in df[cols].itertuples(index=False):
        rows.append(tuple(norm_cell(v) for v in t))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return cols, rows


def dtype_class(dt):
    s = str(dt)
    if "float" in s:
        return "float"
    if "int" in s.lower():
        return "int"
    return "other"


def dtype_mismatch(got, want):
    """The driver hashes exact values, so a float64 oracle column vs a
    BIGINT Spark column hash-mismatches even when values agree. norm_cell
    coerces both to float for the value compare, which HID the q86 oracle
    type bug — so fail loudly on numeric-class drift instead."""
    bad = []
    for c in sorted(set(got.columns) & set(want.columns)):
        g, w = dtype_class(got[c].dtype), dtype_class(want[c].dtype)
        if {g, w} == {"float", "int"}:
            bad.append(f"{c}: spark={got[c].dtype} oracle={want[c].dtype}")
    return bad


def main():
    import duckdb
    run_verify()
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    # Verify's failure manifest: a query that threw mid-run has a marker
    # dir (schema `__error`) and an entry here — fail loudly even for
    # queries with no oracle (which the compare loop below never visits).
    fail_manifest = {}
    if os.path.exists(f"{OUT}/_failed.json"):
        fail_manifest = json.load(open(f"{OUT}/_failed.json"))
    for name, msg in sorted(fail_manifest.items()):
        print(f"FAIL {name}: query threw during Verify: {msg[:200]}")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    passed, failed = 0, len(fail_manifest)
    for name in sorted(oracle):
        if name in fail_manifest:
            continue  # already reported above
        qdir = f"{OUT}/{name}"
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); failed += 1; continue
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        try:
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); failed += 1; continue
        dt_bad = dtype_mismatch(got, want)
        if dt_bad:
            print(f"FAIL {name}: numeric dtype mismatch {dt_bad}"); failed += 1; continue
        gc, gr = frame_key(got)
        wc, wr = frame_key(want)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}"); failed += 1; continue
        if len(gr) != len(wr):
            print(f"FAIL {name}: rows {len(gr)} != {len(wr)}"); failed += 1; continue
        if gr != wr:
            bad = next(i for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  spark: {gr[bad]}")
            print(f"  duck : {wr[bad]}")
            failed += 1
            continue
        print(f"PASS {name} ({len(gr)} rows)")
        passed += 1
    print(f"\n{passed} passed, {failed} failed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
