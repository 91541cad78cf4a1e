#!/usr/bin/env python3
"""Reproducible scale-crossover benchmark: Spark vs DuckDB on the same
SQL at 1x / 10x / 100x replicas of sf0.1.

    python3 tools/benchscale.py [--force] [--out BENCHSCALE.json]

One command regenerates everything the table in BENCHSCALE.md claims:

1. builds /tmp/bsx10 (10x) and /tmp/bsx100 (100x, 60M lineitem rows)
   from /root/testdata/sf0.1 via `graft.ScaleUp` (offset keys keep the
   replicas join-disjoint, so result sizes scale like a real larger SF);
   existing replicas are reused unless --force. Bench replicas live in
   their OWN directories — they must never clobber the correctness-audit
   replicas at /tmp/sfx10 / /tmp/sfx100, which replica_audit.py builds
   from sf0.01 (a bench run once silently upgraded the audit dirs 10x
   and the "10x" audit artifact quietly audited 100x data);
2. dumps the driver's oracle SQL (graft.Verify with an empty filter —
   no queries run, just the SQL dump);
3. runs `graft.Bench` (local[32], min of 3 warm runs per query) and
   `tools/bench_duck.py` (DuckDB, same SQL, same protocol) at each
   scale over the 7 SQL-parity headliners — dd2 is excluded because
   the oracle runs a different ALGORITHM (O(n^2) brute-force Jaccard),
   so the comparison would say nothing about either engine;
4. writes one JSON artifact with per-scale, per-query seconds, row
   counts, and ratios.

The committed BENCHSCALE.json is the artifact from the round it was
generated in; rerun this script to reproduce it (numbers vary by host).
"""
import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SRC = "/root/testdata/sf0.1"
# ss1b (round 9) replaced ss1 as the ANN headliner: the bench-flagged
# registry row now probes the bucket-partitioned LSH layout with file-
# level partition pruning (the amortized standing-pipeline shape the
# ss1_amortization probe below always argued for); ss1 stays in the
# registry as the exact-twin correctness row.
QS = ("q1_pricing_summary,q3_shipping_priority,q5_local_supplier,"
      "q6_revenue_delta,q18_big_orders,q19_disjunctive,ss1b_cosine_topk_indexed")
SCALES = [
    # (label, dir, copies, queries, spark heap — None = 8g default)
    ("1x", SRC, 1, QS, None),
    ("10x", "/tmp/bsx10", 10, QS, None),
    ("100x", "/tmp/bsx100", 100, QS, None),
    # the 1000x arm (600M lineitem rows, ~15 GB parquet): the first
    # point where shuffle/spill actually engage — the 1x..100x points
    # all fit in page cache, so the "designed for 100 TB" slope claim
    # needs this arm. Round 14 extended it from the q1/q5/q18/ss1b
    # subset to the FULL 7-query suite; round 15 runs it as THREE
    # session chains (the r13 subset-arm protocol) so the per-query
    # ratios are an envelope, not a point — r14's single chain left
    # q3's 1.95x riding one measurement with every spread at 0.0.
    # One attempt per query inside each session: intrinsic warm spread
    # at this scale exceeds the idle-machine retry threshold.
    ("1000x", "/tmp/bsx1000", 1000, QS, "48g"),
]
# the DESIGN-SCALE ratio gate stays at 100x (full 7-query suite); the
# 1000x arm is slope evidence, not the headline comparator
DESIGN_SCALE = "100x"
ORACLE_DIR = "/tmp/graft-oracle-dump"


def run(cmd, env=None, capture=False):
    e = None
    if env:
        import os
        e = {**os.environ, **env}
    r = subprocess.run(cmd, cwd=REPO, env=e,
                       capture_output=capture, text=True)
    if r.returncode != 0:
        if capture:
            sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
        raise SystemExit(f"command failed: {' '.join(cmd)}")
    return r.stdout if capture else None


def ensure_replica(dst, copies, force, mem=None):
    # reuse only when the replica has exactly base_rows x copies lineitem
    # rows — a stale dir from an older run (or different naming scheme)
    # would silently bench the wrong scale
    if not force and Path(dst, "lineitem.parquet").exists():
        want = lineitem_rows(SRC) * copies
        try:
            have = lineitem_rows(dst)
        except Exception:
            # a dir with no readable part files = a build that died
            # mid-write (the 1000x OOM left exactly this) — rebuild
            have = -1
        if have == want:
            print(f"[benchscale] reusing {dst} ({have} rows)", flush=True)
            return
        print(f"[benchscale] {dst} has {have} rows, want {want} — rebuilding",
              flush=True)
    print(f"[benchscale] building {dst} = {SRC} x {copies}", flush=True)
    # the BUILD needs the big heap as much as the bench: the key-clustered
    # write sorts ~copies x 600k lineitem rows across 32 in-flight tasks,
    # and the 8g default OOMs at 1000x (each task sorts ~19M rows while
    # 32 parquet writers hold their page buffers)
    run(["sbt", "-batch", f"Test/runMain graft.ScaleUp {SRC} {dst} {copies}"],
        env={"SPARK_DRIVER_MEM": mem} if mem else None)


def ensure_oracle(force):
    # always regenerate: DumpOracle needs no Spark session (seconds), and
    # a stale dump silently hides newly registered queries from the
    # DuckDB timing side (bit round 4 - 181-query dump vs 190 registered)
    p = Path(ORACLE_DIR, "oracle_sql.json")
    print("[benchscale] dumping oracle SQL", flush=True)
    run(["sbt", "-batch", f"runMain graft.DumpOracle {p}"])
    return str(p)


def host_mem():
    """Host page-cache / availability / tmpfs state (MB) — recorded per
    session so a warm-run outlier can be attributed to cache eviction
    instead of published as an unexplained error bar."""
    out = {}
    try:
        with open("/proc/meminfo") as f:
            kv = dict(line.split()[:2] for line in f if ":" in line)
        out["cached_mb"] = int(kv["Cached:"]) // 1024
        out["available_mb"] = int(kv["MemAvailable:"]) // 1024
    except Exception:
        pass
    try:
        import shutil
        du = shutil.disk_usage("/dev/shm")
        out["shm_used_mb"] = du.used // (1 << 20)
    except Exception:
        pass
    return out


CANARY_Q = "ss1b_cosine_topk_indexed"
# a session whose ss1b CPU canary exceeds this factor of the
# cross-session min was CPU-starved from outside the JVM (r16's
# attribution threshold); the rerun budget bounds how many replacement
# sessions one arm may spend chasing a persistently loaded host
CANARY_FACTOR = 1.5
CANARY_RERUN_BUDGET = 2


def spark_bench(sf_dir, qs=QS, sessions=2, mem=None):
    # min per query ACROSS JVM sessions on top of Bench's own min-of-3
    # warm runs: at 60M rows the between-session variance (GC sizing,
    # codegen state, AQE coalescing) is larger than within-session noise.
    # "cold" = first run after Bench clears the decision/verdict caches
    # (gated sides and layout/key checks recomputed, warm JIT) — reported
    # alongside so warm minima can't pass off cache reuse as plan speed.
    # Per-session totals and per-query spreads are recorded so the
    # round-over-round ratio noise is VISIBLE (round 10 produced 0.73x
    # and 0.94x from the same tool with no spread on record).
    env = {"SPARK_GRAFT_SF_DIR": sf_dir,
           "SPARK_GRAFT_BENCH_QS": qs,
           # cross-session min below already absorbs the
           # early-session tax the 2-pass default targets
           "SPARK_GRAFT_BENCH_PASSES": "1"}
    if mem:
        # the 1000x arm shuffles ~600M rows through one JVM: the 8g
        # default heap (fine up to 100x) starves 32 executor threads
        # to ~250 MB each — a cluster posture this arm exists to
        # approximate would never run that tight. DuckDB's default
        # budget on this host is ~100 GB, so a bigger heap is
        # fairness, not a thumb on the scale; recorded per scale.
        env["SPARK_DRIVER_MEM"] = mem
        # intrinsic warm spread at this scale exceeds the
        # idle-machine retry threshold; retries just multiply a
        # minutes-long measurement
        env["SPARK_GRAFT_BENCH_MAX_ATTEMPTS"] = "1"
        # pre-commit the whole heap at JVM start: the r15 q19
        # envelope outlier (warm runs of 8-11s vs a 2.5s min) was
        # adjudicated as kernel allocation stalls while the 48g
        # heap commits against a replica-scale page cache, and the
        # round-16 interleaved A/B confirmed it by intervention —
        # control sessions reproduced 9-10s q19 runs, pre-touched
        # sessions never exceeded 4.1s and showed no q1 scan cost
        # (PRETOUCH_MEASURE.json). Heap commit now happens before
        # the first timed run instead of inside one.
        env["SPARK_GRAFT_JVM_EXTRA"] = f"-Xms{mem} -XX:+AlwaysPreTouch"

    def one_session():
        before = host_mem()
        out = run(["sbt", "-batch", "runMain graft.Bench"],
                  env=env, capture=True)
        # r17: Bench emits TWO json lines — the per-query diagnostics
        # (warm_runs / gc_ms / page-cache state) on their own earlier
        # line, and the compact headline ("metric":"total") as the LAST
        # line for the driver's tail parser. Merge them back here so
        # sessions_detail keeps its full diagnostic record.
        head, diag = None, None
        for line in out.splitlines():
            if '"metric":"diagnostics"' in line:
                diag = json.loads(line.split("[info] ", 1)[-1])
            elif '"metric":"total"' in line:
                head = json.loads(line.split("[info] ", 1)[-1])
        if head is None:
            raise SystemExit(f"no bench output for {sf_dir}")
        for k in ("warm_runs", "gc_ms", "cached_mb_before",
                  "mem_start", "mem_end"):
            if diag and k in diag:
                head[k] = diag[k]
        return before, head

    raw = [one_session() for _ in range(sessions)]

    # canary-gated session rerun (round-16 directive #4): ss1b is
    # constant work with zero shuffle and bucket-pruned IO, so its
    # per-session warm min moves only with host CPU contention. A
    # session whose canary exceeds CANARY_FACTOR x the cross-session
    # min is exogenously starved — RERUN it (bounded) instead of only
    # attributing it in the diagnosis; the trail records every rerun,
    # including ones where the starvation persisted.
    rerun_trail = []
    budget = CANARY_RERUN_BUDGET if sessions > 1 else 0
    while budget > 0:
        canaries = [r["queries"].get(CANARY_Q) for _, r in raw]
        valid = [c for c in canaries if c is not None and c > 0]
        if len(valid) < 2:
            break
        cmin = min(valid)
        idx = max(range(len(canaries)),
                  key=lambda i: canaries[i]
                  if canaries[i] is not None and canaries[i] > 0 else -1.0)
        factor = canaries[idx] / cmin
        if factor <= CANARY_FACTOR:
            break
        budget -= 1
        print(f"[benchscale] session {idx} canary {factor:.2f}x the "
              f"cross-session min — rerunning it "
              f"({budget} rerun(s) left)", flush=True)
        nb, nr = one_session()
        new_canary = nr["queries"].get(CANARY_Q)
        replaced = (new_canary is not None and new_canary > 0
                    and new_canary < canaries[idx])
        rerun_trail.append({
            "session": idx, "canary_factor": round(factor, 2),
            "canary_sec": canaries[idx],
            "rerun_canary_sec": new_canary,
            "replaced": replaced,
            "note": ("rerun replaced the starved session" if replaced else
                     "starvation persisted — original session kept"),
        })
        if replaced:
            raw[idx] = (nb, nr)

    best, cold, session_totals = {}, {}, []
    per_session = {}
    shuffle_mb, spill_mb = {}, {}
    sessions_detail = []
    for before, r in raw:
        session_totals.append(round(sum(
            v for v in r["queries"].values() if v >= 0), 3))
        for k, v in r["queries"].items():
            # keep per_session index-aligned with sessions_detail: a
            # crashed query records None, not a dropped slot (the r16
            # diagnosis once described the wrong session)
            per_session.setdefault(k, []).append(v if v >= 0 else None)
            if v >= 0 and (k not in best or v < best[k]):
                best[k] = v
        for k, v in r.get("cold", {}).items():
            if v >= 0 and (k not in cold or v < cold[k]):
                cold[k] = v
        # plan-measured bytes; max across sessions (conservative)
        for key, acc in (("cold_shuffle_write_mb", shuffle_mb),
                         ("cold_spill_mb", spill_mb)):
            for k, v in r.get(key, {}).items():
                if k not in acc or v > acc[k]:
                    acc[k] = v
        # full per-session diagnostics: individual warm runs, GC
        # time in the warm block, page-cache state before each
        # query's block and at session start/end — the data that
        # names a session outlier (r15's q19 ±6.2s had none)
        sessions_detail.append({
            "host_before": before,
            "queries": r["queries"],
            "warm_runs": r.get("warm_runs", {}),
            # per-SESSION cold plan bytes: a session whose gated
            # broadcast fell to the shuffle path is visible here
            # even when another session wins the merged min (the
            # merged cold_shuffle_write_mb shows only the winner)
            "cold_shuffle_write_mb": r.get("cold_shuffle_write_mb", {}),
            "gc_ms": r.get("gc_ms", {}),
            "cached_mb_before": r.get("cached_mb_before", {}),
            "mem_start": r.get("mem_start", {}),
            "mem_end": r.get("mem_end", {}),
            "load_avg": [r.get("load_avg_start"),
                         r.get("load_avg_end")],
        })
    return {"value": sum(best.values()), "queries": best,
            "canary_rerun_trail": rerun_trail,
            "session_totals": session_totals,
            "spread": round(max(session_totals) - min(session_totals), 3),
            "query_spread": {k: round(max(vv) - min(vv), 3)
                             for k, v in per_session.items()
                             for vv in [[x for x in v
                                         if x is not None and x >= 0]]
                             if len(vv) >= 1},
            "cold_value": round(sum(cold.values()), 3),
            "cold_queries": {k: round(v, 3) for k, v in cold.items()},
            "cold_shuffle_write_mb": shuffle_mb,
            "cold_spill_mb": spill_mb,
            "sessions_detail": sessions_detail,
            "outlier_diagnosis": diagnose_outlier(per_session,
                                                  sessions_detail)}


def diagnose_outlier(per_session, sessions_detail):
    """Mechanical diagnosis of the widest per-query session spread: which
    session was slow, whether its individual warm runs were uniformly
    slow (persistent state: evicted page cache / heap pressure) or
    one-run-slow (transient: GC pause, scheduler), and how its GC time
    and pre-block page cache compared to the other sessions'. The
    artifact RECORDS the cause next to the number instead of leaving an
    error bar unexplained."""
    if not per_session or not sessions_detail:
        return None
    # per_session slots are index-aligned with sessions_detail (a
    # crashed query holds None) — compute spreads over the valid values
    # only, but keep indices so slow_session points at the right session
    def valid(vs):
        return [v for v in vs if v is not None and v >= 0]

    spreadable = {k: v for k, v in per_session.items() if len(valid(v)) >= 2}
    if not spreadable:
        return None
    q, vals = max(spreadable.items(),
                  key=lambda kv: max(valid(kv[1])) - min(valid(kv[1])))
    vmax, vmin = max(valid(vals)), min(valid(vals))
    spread = round(vmax - vmin, 3)
    if spread < 0.5:
        return {"query": q, "spread_sec": spread,
                "note": "no session outlier above 0.5s"}
    slow = vals.index(vmax)
    runs = [d["warm_runs"].get(q) for d in sessions_detail]
    gcs = [d["gc_ms"].get(q) for d in sessions_detail]
    cached = [d["cached_mb_before"].get(q) for d in sessions_detail]
    shuf = [d.get("cold_shuffle_write_mb", {}).get(q)
            for d in sessions_detail]
    slow_runs = runs[slow] or []
    uniform = (len(slow_runs) == 3 and
               min(slow_runs) > 1.5 * vmin)
    # ss1b is a per-session CPU canary: constant work, zero IO beyond
    # the pruned buckets, zero shuffle — its per-session warm min moves
    # ONLY with host CPU contention. A slow session whose canary factor
    # explains the outlier is exogenous host load; a residual above the
    # canary is query-specific session state (plan decision, cache).
    canary = per_session.get("ss1b_cosine_topk_indexed")
    canary_factor = residual_factor = None
    if (canary and len(canary) == len(vals) and len(valid(canary)) ==
            len(canary) and min(canary) > 0):
        canary_factor = round(canary[slow] / min(canary), 2)
        residual_factor = round((vals[slow] / vmin) / canary_factor, 2)
    return {
        "query": q, "spread_sec": spread, "slow_session": slow,
        "per_session_warm_min": vals,
        "per_session_warm_runs": runs,
        "per_session_gc_ms": gcs,
        "per_session_cached_mb_before": cached,
        "per_session_cold_shuffle_write_mb": shuf,
        "slow_session_cpu_canary_factor": canary_factor,
        "slow_session_residual_factor": residual_factor,
        "pattern": ("uniform: all three warm runs slow — a condition "
                    "persisting across the whole block, not a transient "
                    "pause; the CPU canary below attributes it" if uniform
                    else
                    "transient: the min run matches the other sessions "
                    "— a one-off pause (GC / scheduler), the min-of-3 "
                    "absorbs it"),
    }


def duck_bench(sf_dir, oracle, qs=QS):
    out = run([sys.executable, "tools/bench_duck.py", sf_dir, oracle, qs],
              capture=True)
    return json.loads(out.splitlines()[-1])


def lineitem_rows(sf_dir):
    import duckdb
    p = Path(sf_dir, "lineitem.parquet")
    glob = f"{p}/*.parquet" if p.is_dir() else str(p)
    return duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{glob}')").fetchone()[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force", action="store_true",
                    help="rebuild replicas and oracle dump")
    ap.add_argument("--out", default=str(REPO / "BENCHSCALE.json"))
    args = ap.parse_args()

    for _, dst, copies, _qs, _mem in SCALES:
        if copies > 1:
            ensure_replica(dst, copies, args.force, mem=_mem)
    oracle = ensure_oracle(args.force)

    scales = []
    for label, sf_dir, copies, qs, mem in SCALES:
        print(f"[benchscale] benching {label} ({sf_dir})", flush=True)
        sp = spark_bench(sf_dir, qs, sessions=3 if mem else 2, mem=mem)
        du = duck_bench(sf_dir, oracle, qs)
        ratio = sp["value"] / du["value"] if du["value"] else None
        scales.append({
            "scale": label, "dir": sf_dir,
            "queries_run": qs.split(","),
            "spark_heap": mem or "8g",
            "spark_jvm_extra": (f"-Xms{mem} -XX:+AlwaysPreTouch"
                                if mem else None),
            "lineitem_rows": lineitem_rows(sf_dir),
            "spark_sec": round(sp["value"], 3),
            "duckdb_sec": round(du["value"], 3),
            "ratio": round(ratio, 2),
            "spark_session_totals_sec": sp["session_totals"],
            "spark_spread_sec": sp["spread"],
            "spark_query_spread_sec": sp["query_spread"],
            "spark_queries": {k: round(v, 3) for k, v in sp["queries"].items()},
            "spark_cold_sec": sp["cold_value"],
            "spark_cold_queries": sp["cold_queries"],
            "spark_cold_shuffle_write_mb": sp["cold_shuffle_write_mb"],
            "spark_cold_spill_mb": sp["cold_spill_mb"],
            "duckdb_queries": du["queries"],
            "duckdb_query_spread_sec": du.get("query_spread", {}),
            "spark_sessions_detail": sp["sessions_detail"],
            "spark_outlier_diagnosis": sp["outlier_diagnosis"],
            "spark_canary_rerun_trail": sp.get("canary_rerun_trail", []),
        })
        print(f"[benchscale] {label}: spark {sp['value']:.2f}s "
              f"(session spread {sp['spread']:.2f}s) "
              f"duckdb {du['value']:.2f}s ratio {ratio:.2f}x", flush=True)

    # ss1 amortization probe at the design-scale replica: the remaining >2x
    # row is a per-job scheduling floor; this measures its SEQUENTIAL
    # in-session marginal cost (suite back-to-back with vs without ss1b
    # — the posture the bench and a standing pipeline use) and reports
    # the concurrent-FAIR delta separately as contention context
    print("[benchscale] ss1 amortization probe (100x)", flush=True)
    amort_out = run(["sbt", "-batch",
                     "Test/runMain graft.ProfileAmortize "
                     + next(d for l, d, _, _, _ in SCALES
                            if l == DESIGN_SCALE)],
                    capture=True)
    amort = None
    for line in amort_out.splitlines():
        if '"ss1_amortization"' in line:
            amort = json.loads(line.split("[info] ", 1)[-1])
            break
    if amort is None:
        raise SystemExit("no ss1 amortization output")

    # the same sequential-marginal protocol at the 1000x replica (the
    # round-15 directive: ss1b's solo ratio there had no marginal row to
    # price it fairly). seqOnly skips the concurrent contention arms —
    # seven 600M-row suites overlapping in one heap measure memory
    # contention, not amortization.
    amort1000 = None
    big1000 = next((s for l, d, _, _, m in SCALES
                    if l == "1000x" for s in [(d, m)]), None)
    if big1000:
        print("[benchscale] ss1 amortization probe (1000x, seq-only)",
              flush=True)
        # same session posture as the 1000x bench arm: big heap,
        # pre-touched (see spark_bench) — the marginal number must be
        # measured under the protocol whose envelope it prices
        env1000 = ({"SPARK_DRIVER_MEM": big1000[1],
                    "SPARK_GRAFT_JVM_EXTRA":
                        f"-Xms{big1000[1]} -XX:+AlwaysPreTouch"}
                   if big1000[1] else None)
        out1000 = run(["sbt", "-batch",
                       f"Test/runMain graft.ProfileAmortize {big1000[0]} seqOnly"],
                      env=env1000, capture=True)
        for line in out1000.splitlines():
            if '"ss1_amortization"' in line:
                amort1000 = json.loads(line.split("[info] ", 1)[-1])
                break
        if amort1000 is None:
            raise SystemExit("no 1000x ss1 amortization output")

    artifact = {
        "metric": "benchscale",
        "generated_unix": int(time.time()),
        "design_scale": DESIGN_SCALE,
        "ss1_amortization": amort,
        "ss1_amortization_1000x": amort1000,
        "protocol": "min of 3 warm runs per query per engine; local[32]; "
                    "identical SQL semantics (driver oracle text) on "
                    "identical parquet",
        "queries": QS.split(","),
        "note_sf01": "at sf0.1 (600k rows) the ratio is dominated by "
                     "Spark's ~0.4-0.5s/query fixed cost (scheduling, "
                     "stage barriers) vs an in-process engine; the slope "
                     "term converges by 60M rows — see ratios",
        "scales": scales,
    }
    Path(args.out).write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"[benchscale] wrote {args.out}", flush=True)
    render_md(artifact)


def render_md(artifact, md_path=REPO / "BENCHSCALE.md"):
    """Rewrite the marked results block of BENCHSCALE.md from the freshly
    written artifact — the .md tables come from the SAME run as the
    .json, so the two can no longer drift (the r5/r6 failure mode, in
    both directions)."""
    begin, end = "<!-- benchscale:begin -->", "<!-- benchscale:end -->"
    lines = [begin,
             "",
             f"(auto-rendered by tools/benchscale.py from BENCHSCALE.json, "
             f"generated_unix={artifact['generated_unix']} — edit the "
             f"script, not this block)",
             "",
             "| scale | lineitem rows | Spark warm | session spread | Spark cold | DuckDB | warm ratio |",
             "|---|---|---|---|---|---|---|"]
    for s in artifact["scales"]:
        spread = s.get("spark_spread_sec")
        spread_txt = f"±{spread:.2f} s" if spread is not None else "—"
        nq = len(s.get("queries_run", []))
        scale_txt = s["scale"] + (f" ({nq}-query subset)"
                                  if nq and nq != len(artifact["queries"])
                                  else "")
        lines.append(
            f"| {scale_txt} ({s['dir']}) | {s['lineitem_rows']:,} "
            f"| {s['spark_sec']:.2f} s | {spread_txt} "
            f"| {s.get('spark_cold_sec', float('nan')):.2f} s "
            f"| {s['duckdb_sec']:.2f} s | {s['ratio']:.2f}× |")
    if any(s["scale"] == "1000x" for s in artifact["scales"]):
        lines += ["",
                  "The 1000× arm (600 M lineitem rows, ~15 GB parquet) "
                  "runs the FULL 7-query suite — the first point where "
                  "shuffle and spill actually engage (every smaller scale "
                  "fits in page cache). It runs with a 48 g Spark heap "
                  "(the 8 g default that is fine up to 100× starves 32 "
                  "executor threads at this shuffle size; DuckDB's "
                  "default budget on this host is ~100 GB — heaps are "
                  "recorded per scale in the JSON). 100× remains the "
                  "design-scale comparator on the full suite; the 1000× "
                  "ratio is slope evidence for the 100 TB claim."]
    # per-query table + amortization prose anchor on the DESIGN scale
    # (100x, full suite); the 1000x arm appears in the scales table with
    # its own subset note
    big = next(s for s in artifact["scales"]
               if s["scale"] == artifact.get("design_scale", "100x"))
    lines += ["",
              f"Per-query at {big['scale']} (warm s / cold s / DuckDB s):",
              "",
              "| query | Spark warm | Spark cold | DuckDB | warm ratio |",
              "|---|---|---|---|---|"]
    for q in artifact["queries"]:
        sw = big["spark_queries"].get(q)
        sc = big.get("spark_cold_queries", {}).get(q)
        dd = big["duckdb_queries"].get(q)
        if sw is None or dd is None:
            continue
        sc_txt = f"{sc:.2f} s" if sc is not None else "—"
        lines.append(f"| {q} | {sw:.2f} s | {sc_txt} | {dd:.2f} s "
                     f"| {sw / dd:.2f}× |")
    am = artifact.get("ss1_amortization")
    if am:
        lines += ["",
                  f"ss1b fixed-cost at {big['scale']}: solo "
                  f"{am['ss1_solo_sec']:.2f} s (min-of-3); SEQUENTIAL "
                  f"in-session marginal — the 7-headliner suite run "
                  f"back-to-back in one session with vs without ss1b, 5 "
                  f"paired iterations, median of per-pair differences "
                  f"(arm minima {am['seq7_sec']:.2f} s vs "
                  f"{am['seq6_sec']:.2f} s; the posture the driver's "
                  f"bench and a standing pipeline actually use) = "
                  f"{am['ss1_marginal_sec']:.2f} s. ss1b's solo ratio is "
                  f"the one headline row above 2× and it is a KNOWN "
                  f"CONSTANT, not a plan defect: the plan is "
                  f"PartitionFilters to the probed LSH buckets + codegen "
                  f"cosine + TakeOrdered with zero shuffle (PLANS.md), so "
                  f"the ~0.2 s absolute cost is Spark's per-job "
                  f"scheduling floor — a small additive constant per "
                  f"suite, which the solo DuckDB ratio prices as if paid "
                  f"per process per query. Context, NOT amortization "
                  f"evidence: the same suites submitted concurrently "
                  f"under FAIR scheduling differ by "
                  f"{am['concurrent_marginal_sec']:.2f} s "
                  f"({am['concurrent_batch7_sec']:.2f} s vs "
                  f"{am['concurrent_batch6_sec']:.2f} s) — that delta "
                  f"bundles scheduler/CPU contention among overlapping "
                  f"jobs and is reported only to bound the multi-tenant "
                  f"cost."]
    am1k = artifact.get("ss1_amortization_1000x")
    if am1k:
        m = am1k["ss1_marginal_sec"]
        # a marginal at or below ~0 means the with/without difference
        # drowned in the session noise floor at this replica — say that
        # instead of printing a negative price
        price = (f"prices ss1b at {m:.2f} s marginal" if m > 0.05 else
                 f"measures ss1b's marginal as indistinguishable from "
                 f"zero ({m:+.2f} s — inside the session noise floor)")
        lines += ["",
                  f"At 1000× the same paired sequential-marginal "
                  f"protocol (seq-only, median of 5 per-pair "
                  f"differences) {price} "
                  f"(arm minima {am1k['seq7_sec']:.2f} s with vs "
                  f"{am1k['seq6_sec']:.2f} s without; solo "
                  f"{am1k['ss1_solo_sec']:.2f} s) — the solo ratio's "
                  f"numerator is a per-job constant, and this is its "
                  f"recorded in-suite price at the largest replica."]
    diag = next((s.get("spark_outlier_diagnosis")
                 for s in artifact["scales"] if s["scale"] == "1000x"),
                None)
    if diag and diag.get("slow_session") is not None:
        canary = ""
        if diag.get("slow_session_cpu_canary_factor") is not None:
            canary = (f" The slow session's ss1b CPU canary ran "
                      f"{diag['slow_session_cpu_canary_factor']:.2f}× its "
                      f"cross-session min (exogenous host contention "
                      f"during that session); the outlier's residual "
                      f"above that factor is "
                      f"{diag['slow_session_residual_factor']:.2f}×.")
        lines += ["",
                  f"Widest 1000× per-query session spread: "
                  f"{diag['query']} ±{diag['spread_sec']:.2f} s "
                  f"(session {diag['slow_session']} — "
                  f"{diag['pattern']}; per-session warm minima, "
                  f"individual runs, GC ms, pre-block page-cache MB, and "
                  f"per-session cold-plan shuffle bytes are recorded in "
                  f"the JSON under spark_outlier_diagnosis / "
                  f"spark_sessions_detail).{canary}"]
    lines += ["",
              "Session spread = max−min of the per-session warm sums across "
              "JVM sessions (2 at ≤100×, 3 at 1000×) — the run-to-run noise "
              "floor for the warm ratio (round 10 saw 0.73× vs 0.94× at "
              "100× from this variance alone; per-session totals and "
              "per-query spreads are in the JSON). Treat round-over-round "
              "ratio deltas smaller than the spread as noise.",
              "",
              "Warm = min of 3 in-session runs × the JVM sessions above, "
              "session caches (gated-broadcast sides, lookup tables, "
              "layout/key verdicts) intact — "
              "the standing-pipeline posture. Cold = first run after those "
              "caches are cleared (JIT warm): every verification pass and "
              "gated materialization recomputed, the fair comparison point "
              "against DuckDB's full recompute. DuckDB = min of 3 warm runs, "
              "same SQL, same parquet, 32 threads.",
              end]
    text = md_path.read_text()
    i, j = text.find(begin), text.find(end)
    if i < 0 or j < 0:
        raise SystemExit(f"markers missing in {md_path}")
    md_path.write_text(text[:i] + "\n".join(lines) + text[j + len(end):])
    print(f"[benchscale] rendered {md_path}", flush=True)


if __name__ == "__main__":
    main()
