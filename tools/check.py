#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tooling only; the
library itself has no Python dependency). Usage:

    python3 tools/check.py <sfDir> <verifyOutDir> [--present-only]

With --present-only, checks only the queries whose parquet dump exists in
<verifyOutDir> (for name-filtered graft.Verify runs — dev iteration and
tools/precommit.py); the full-registry mode treats a missing dump as FAIL.

Loads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB with the sfDir tables registered
as views, and compares: column names (sorted), per-column DuckDB types
(type-faithful, mirroring the driver gate — a HUGEINT oracle column vs a
Spark BIGINT is a FAIL even when every value matches), row count, and values
with 8-digit float tolerance, order-insensitive.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 8)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    return v


def type_mismatches(got_cols, got_types, want_cols, want_types):
    """Type-faithful column compare (driver-gate strictness). Returns a list
    of (col, spark_type, duck_type) disagreements. Types are DuckDB type
    strings as seen when DuckDB reads the Spark parquet vs runs the oracle
    SQL — so any HUGEINT (or other dtype drift) the driver's hasher would
    render differently fails here too."""
    gt = {c: str(t) for c, t in zip(got_cols, got_types)}
    wt = {c: str(t) for c, t in zip(want_cols, want_types)}
    bad = []
    for c in sorted(gt):
        a, b = gt[c], wt.get(c, "<missing>")
        if a != b:
            bad.append((c, a, b))
    return bad


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    present_only = "--present-only" in sys.argv[3:]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():  # Spark-written replica: directory of part files
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    n_pass = n_fail = 0
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        pdir = Path(out_dir) / name
        if not pdir.exists():
            if present_only:
                continue
            results[name] = "MISSING(spark output)"
            n_fail += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{pdir}/*.parquet')")
            got_cols, got_types = list(got.columns), list(got.types)
            got_rows = got.fetchall()
            want = con.sql(sql)
            want_cols, want_types = list(want.columns), list(want.types)
            want_rows = want.fetchall()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(want_cols):
            results[name] = f"COLS: spark={sorted(got_cols)} duck={sorted(want_cols)}"
            n_fail += 1
            continue
        bad_types = type_mismatches(got_cols, got_types, want_cols, want_types)
        if bad_types:
            results[name] = "TYPES: " + "; ".join(
                f"{c}: spark={a} duck={b}" for c, a, b in bad_types)
            n_fail += 1
            continue
        if len(got_rows) != len(want_rows):
            results[name] = f"ROWS: spark={len(got_rows)} duck={len(want_rows)}"
            n_fail += 1
            continue
        g, w = norm(got_rows, got_cols), norm(want_rows, want_cols)
        if g != w:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b)
            results[name] = f"VALUES: first diff at sorted-row {diff[0]}: spark={diff[1]} duck={diff[2]}"
            n_fail += 1
            continue
        results[name] = "PASS"
        n_pass += 1
    for name, r in results.items():
        print(("PASS " if r == "PASS" else "FAIL ") + name + ("" if r == "PASS" else f" :: {r}"))
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
