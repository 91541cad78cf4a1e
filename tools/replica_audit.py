#!/usr/bin/env python3
"""Multi-partition correctness audit: run the oracle-gated registry
against a ScaleUp replica and compare with DuckDB on the same data.

    python3 tools/replica_audit.py [replicaDir]   (default /tmp/sfx10)

Why this exists: the driver's gate runs at sf0.001/sf0.01, where every
table is a single scan partition — partition-count-dependent holes pass
it green. Round 6's AllTuples bug (a global aggregate silently reading
partition 0 only) was invisible at the gate scale and obvious at a
replica. This audit runs every query whose oracle is linear-cost at
replica scale (the dd*/ss*/mm* quadratic/list-heavy oracles are
excluded — their DuckDB side is O(n^2) brute force by design; ss1's
linear oracle is kept) and fails loudly on any mismatch.

The replica must have been built by `graft.ScaleUp` (which includes the
events table since round 6).
"""
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main():
    replica = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfx10"
    out = "/tmp/graft-replica-audit"
    oracle = json.loads((REPO / "ORACLE_SQL.json").read_text())
    keep = sorted(n for n in oracle
                  if not n.startswith(("dd", "ss", "mm"))) + ["ss1_cosine_topk"]
    keep = sorted(set(keep))
    print(f"[audit] {len(keep)} queries at {replica}", flush=True)
    subprocess.run(["rm", "-rf", out], check=True)
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {replica} {out} {','.join(keep)}"],
        cwd=REPO)
    if r.returncode != 0:
        raise SystemExit("verify run failed")
    chk = subprocess.run(
        ["python3", "tools/check.py", replica, out],
        cwd=REPO, capture_output=True, text=True)
    lines = chk.stdout.splitlines()
    missing_ok = {n for n in oracle} - set(keep)
    real_fail = [l for l in lines if l.startswith("FAIL")
                 and l.split()[1] not in missing_ok]
    n_pass = sum(1 for l in lines if l.startswith("PASS"))
    print(f"[audit] {n_pass} pass, {len(real_fail)} fail "
          f"({len(missing_ok)} excluded quadratic-oracle queries)")
    for l in real_fail:
        print("[audit] " + l)
    raise SystemExit(1 if real_fail else 0)


if __name__ == "__main__":
    main()
