#!/usr/bin/env python3
"""DuckDB-side timing comparator for the bench queries (dev tooling only).

    python3 tools/bench_duck.py <sfDir> <oracleSqlJson> <q1,q2,...>

Times each named query's oracle SQL against the sfDir tables (min of 3
warm runs, matching graft.Bench's protocol) and prints one JSON line.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    con = duckdb.connect()
    for t in TABLES:
        p = Path(f"{sf_dir}/{t}.parquet")
        if p.is_dir():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(oracle_path).read_text())
    out, spread = {}, {}
    for name in names:
        sql = oracle[name]
        con.execute(sql).fetchall()  # warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        out[name] = round(min(times), 4)
        spread[name] = round(max(times) - min(times), 4)
    print(json.dumps({"metric": "duckdb_total",
                      "value": round(sum(out.values()), 4),
                      "unit": "sec", "queries": out,
                      "query_spread": spread, "sf": sf_dir}))


if __name__ == "__main__":
    main()
