#!/usr/bin/env python3
"""check.py variant with a per-oracle timeout — for replica-scale audits
where some DuckDB oracles (correlated as-of subqueries, token explosions)
are superlinear and would hold the whole compare hostage.

    python3 tools/check_timeout.py <sfDir> <verifyOutDir> [timeoutSec=150]

Prints PASS/FAIL per query, SKIP for oracles that exceed the timeout
(the Spark side already produced output; only the DuckDB referee is too
slow at that scale — re-audit those rows at a smaller replica).
"""
import json
import sys
import threading
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent))
from check import canon, norm, TABLES  # noqa: E402


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout_s = int(sys.argv[3]) if len(sys.argv) > 3 else 150
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).is_dir():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    names = [n for n in sorted(oracle) if (Path(out_dir) / n).exists()]
    n_pass = n_fail = n_skip = 0
    for name in names:
        t0 = time.time()
        # the flag closes the cancel() race: if the timer fires after the
        # oracle fetch completes but before cancel(), the interrupt lands
        # on the NEXT duckdb call — without the flag a passing query gets
        # miscounted as FAIL on its spark-output read
        fired = threading.Event()

        def _interrupt():
            fired.set()
            con.interrupt()

        timer = threading.Timer(timeout_s, _interrupt)
        timer.start()
        try:
            want = con.execute(oracle[name]).fetchall()
            wcols = [d[0] for d in con.description]
        except Exception as e:
            timer.cancel()
            msg = str(e)
            if fired.is_set() or "interrupt" in msg.lower():
                print(f"SKIP {name} :: oracle >{timeout_s}s at this scale",
                      flush=True)
                n_skip += 1
            else:
                print(f"FAIL {name} :: oracle error {msg[:140]}", flush=True)
                n_fail += 1
            continue
        timer.cancel()

        def read_spark():
            rows = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchall()
            return rows, [d[0] for d in con.description]

        try:
            try:
                got, gcols = read_spark()
            except Exception as e:
                if fired.is_set() and "interrupt" in str(e).lower():
                    # stale interrupt from the race above, now consumed —
                    # the oracle DID finish; retry the read once
                    got, gcols = read_spark()
                else:
                    raise
        except Exception as e:
            print(f"FAIL {name} :: spark read error {e}", flush=True)
            n_fail += 1
            continue
        if sorted(wcols) != sorted(gcols):
            print(f"FAIL {name} :: cols {sorted(gcols)} != {sorted(wcols)}",
                  flush=True)
            n_fail += 1
        elif norm(got, gcols) != norm(want, wcols):
            print(f"FAIL {name} :: values differ "
                  f"(rows {len(got)} vs {len(want)})", flush=True)
            n_fail += 1
        else:
            print(f"PASS {name} ({time.time() - t0:.0f}s)", flush=True)
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} skip ==", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
