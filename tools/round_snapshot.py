#!/usr/bin/env python3
"""End-of-round artifact regeneration, in dependency order, at one HEAD.

    python3 tools/round_snapshot.py [--bench] [--audit-100x]

Exists because the round-5/6 failure mode was ORDERING: an artifact
regenerated before the last registry edit (or an .md narrating an older
.json) ships numbers that disagree with HEAD. This chains every
regeneration AFTER the final code change, so one invocation leaves the
tree internally consistent:

1. `sbt test`                      — the whole suite must be green
2. `graft.DumpOracle`              — ORACLE_SQL.json from the registry AT HEAD
3. `graft.Verify` @ sf0.01 + check — the driver-gate stand-in, full registry
4. `tools/replica_audit.py` @ 10x  — multi-partition audit (AllTuples class)
5. (--audit-100x) bounded audit at the 100x replica
6. (--bench) `tools/benchscale.py` — regenerates BENCHSCALE.json AND its .md

Run it with a clean tree, then commit the artifacts it touched in one
snapshot commit. Anything red stops the chain (nothing later is stale).
"""
import argparse
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
VERIFY_OUT = "/tmp/graft-verify-snapshot"
SF = "/root/testdata/sf0.01"


def step(title, cmd):
    print(f"\n[snapshot] === {title}: {' '.join(cmd)}", flush=True)
    r = subprocess.run(cmd, cwd=REPO)
    if r.returncode != 0:
        raise SystemExit(f"[snapshot] STOP — '{title}' failed; artifacts "
                         "after this point were NOT regenerated")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bench", action="store_true",
                    help="also rerun tools/benchscale.py (minutes)")
    ap.add_argument("--audit-100x", action="store_true",
                    help="also run the bounded audit at /tmp/sfx100")
    ap.add_argument("--skip-tests", action="store_true",
                    help="skip sbt test (only if just run at this HEAD)")
    args = ap.parse_args()

    dirty = subprocess.run(["git", "status", "--porcelain"], cwd=REPO,
                           capture_output=True, text=True).stdout.strip()
    if dirty:
        print("[snapshot] WARNING: tree is dirty — artifacts will record "
              "HEAD but reflect the working tree:\n" + dirty, flush=True)

    if not args.skip_tests:
        step("sbt test", ["sbt", "-batch", "test"])
    step("oracle dump", ["sbt", "-batch", "runMain graft.DumpOracle ORACLE_SQL.json"])
    subprocess.run(["rm", "-rf", VERIFY_OUT], check=True)
    step("verify @ sf0.01",
         ["sbt", "-batch", f"runMain graft.Verify {SF} {VERIFY_OUT}"])
    step("oracle check @ sf0.01",
         [sys.executable, "tools/check.py", SF, VERIFY_OUT])
    step("replica audit 10x",
         [sys.executable, "tools/replica_audit.py", "/tmp/sfx10"])
    step("ANN recall audit 10x (ss2/ss3's at-scale evidence)",
         ["sbt", "-batch",
          "Test/runMain graft.RecallAudit /tmp/sfx10 RECALL_AUDIT_10x.json"])
    if args.audit_100x:
        step("replica audit 100x (bounded)",
             [sys.executable, "tools/replica_audit.py", "/tmp/sfx100",
              "--bounded"])
    if args.bench:
        step("benchscale", [sys.executable, "tools/benchscale.py"])
    print("\n[snapshot] all green — commit ORACLE_SQL.json, "
          "REPLICA_AUDIT_*.json, RECALL_AUDIT_10x.json"
          + (", BENCHSCALE.json/md" if args.bench else "")
          + " at this HEAD", flush=True)


if __name__ == "__main__":
    main()
