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
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# Queries whose OUTPUT is superlinear in sf: the r2 join-semantics rows
# key on custkey % 100 (100 distinct keys) to exercise NULL-key joins,
# so inner/left/right/full output grows quadratically with the replica
# factor (2e11 rows at 100x). They are correctness rows, not scale rows
# — audited at 10x, excluded with --bounded at 100x along with
# full-table projections (e*) and token-explosion rows.
BOUNDED_PREFIXES = (
    "q1", "q2", "q3", "q5", "q6", "q7", "q8", "q9", "q10", "q11", "q12",
    "q14", "q15", "q16", "q17", "q18", "q19", "q21", "q22",
    "s1_", "s2_", "s3_", "s4_", "s5_", "w1", "w2", "w3", "w4", "w5", "w6",
    "w7", "g1", "g2", "g3",
    "a1_", "a2_", "a3_", "a4_", "a5_", "a6_", "a7_", "a8_", "a9_", "a10", "a11",
    "rj1", "rj2", "rj3", "st1", "st2", "st3", "st4", "st5", "st6", "st7",
    # cur1_/cur10/cur11 anchored individually: a bare "cur1" would also
    # classify any future cur1x row (cur12/cur13's all-pairs intake
    # oracles — audited unbounded at 10x, excluded here) as linear by
    # accident
    "cur1_", "cur10", "cur11", "cur2", "cur3", "cur4", "cur5",
    "hp1", "tx", "i1", "i2", "d1", "d2",
    "r1_", "r7_", "bp1", "cc1", "tf1",
    "st8", "st9", "zo1", "cd1", "cd2", "sk1", "sk2",
    "fn1", "fe2", "fe3", "fe4", "tok", "dd13", "dq2", "an1", "cohort1",
    "ddf5", "tx10",
    # round-8 session-3 additions, all linear-cost oracles (rf27's
    # generated sides are sf-independent; fj1 is excluded above —
    # its all-pairs oracle is quadratic in the replica factor)
    "sk3", "sk4", "sk5", "s7_", "dq3", "pm1", "pm2", "gr1", "ii1",
    "rf27", "rf28", "cc2", "ts3", "ts4", "gr2", "dq4",
    # round-9: pruned-ANN recall rows — oracle replays the pruned search
    # (bucketing/assignment is n×nbits / n×k dot products, linear)
    "ss2_ann", "ss3_ann", "ss1b",
    # round-9 scan ops: prefix-sum packing, bigram scoring, HLL registers,
    # substring-dedup stats — all linear-cost oracles
    "pk1", "pk2", "lm1", "sk6", "sk7", "dd15", "dd16",
    # round-9 late additions: containment join (cc1-shaped), the
    # temperature mix (source-cardinality), and the bottom-k quantile
    # sketch (TakeOrdered + one exact percentile) are linear-cost oracles
    "cc3", "cur7", "sk8",
    # farthest-first traversal: k scans x (n x <=k) cosines, linear
    "cur8",
    # seasonal decomposition: day-grain windows + dow aggregate, linear
    "ts5",
    # k-fold encode (category x 5 grain) and CUSUM (day-grain recursion
    # of constant depth) are linear-cost oracles
    "fe5", "an3",
    # per-source feature drift: one feature pass + (sources x 256)
    # bounded-frame algebra, linear
    "an4",
    # incremental-CC / containment / DSIR fuzz: generated sf-independent
    # data
    "rf29", "rf30", "rf31", "rf32",
    # k-anonymity: one aggregate to QI-cardinality rows
    "dq5",
    # CMS join-size estimate: two sketch-sized aggregates
    "sk9",
    # Neyman allocation: one aggregate to source-cardinality rows
    "s9_",
    # dataset diff: one full-outer join on the key, linear
    "cd3",
    # PageRank / HITS / k-core / BFS / personalized PageRank: fixed
    # iterations of node-grain join+agg over the vocabulary-grain cooc
    # edge list, linear each
    "gr3", "gr4", "gr5", "gr6", "gr7",
    # DSIR selection family + signed feature hashing: one explode + a
    # constant 256/64-bucket feature space; imp3's packing window is the
    # pk1 cumulative sum — all linear-cost oracles
    "imp", "fe6",
    # UniMax water-filling: one token aggregate to a source-cardinality
    # frame + window algebra, linear
    "cur9",
    # round-10: prototype prune + JL projection (one explode to
    # component grain, bounded centroid/sign frames), CCNet buckets
    # (lm1's linear machinery + source-partition NTILE), rank-AUC
    # (score-grain count algebra over lm1 + dd15's linear label)
    "fe7", "an5", "cur10",
    # an6 shares an5's linear machinery; dq6 is one embeddings-pool
    # scan to a 4-row rollup (dd20's oracle is cluster-quadratic like
    # dd11's -> stays audit-excluded with its family)
    "an6", "dq6",
    # KS drift: one pass to the (source, score) count table, then
    # bounded-grid algebra; temporal split: one events scan + user-set
    # joins at split grain
    "an7", "s11",
    # CDC chunking: corpus-chars-grain list comprehension + chunk-hash
    # aggregate, linear; rf33's generated sides are sf-independent
    "dd21", "rf33",
    # WARC walk: per-doc byte arithmetic, linear
    "mm7",
    # (ss7 IVF+PQ replay is linear but its oracle pays n x 128
    # sub-block cosines through a 3-way-cross window argmax — past the
    # 150s bounded referee at 100x; audited unbounded at 10x instead)
    # tar walks: per-doc 512-block arithmetic, linear
    "mm8", "mm9",
    # version profile diff: two single-scan aggregates to 9 metric rows
    "dq7",
    # container fuzz: generated sf-independent sweep
    "rf34",
    # PR curve: an5's linear machinery to a score-grain frame
    "an8",
    # Cohen's kappa: one scan + a 1-row aggregate; winsorize: one value
    # sort per group + group-grain clamp join — both linear-cost oracles
    "an9", "fe8",
    # Holt-Winters: ts3's day-grain recursion with a 7-slot state
    "ts6",
    # chunk-dedup apply (dd21's scan + doc-grain rebuild) and Markov
    # attribution (journey scan + bounded-matrix MATERIALIZED algebra)
    "dd22", "pm3",
    # filtered ANN: pushed label filter + per-label top-k, linear
    "ss8",
    # incremental join-view refresh: one fact scan + dim join + merge
    "inc",
    # unigram fuzz: generated sf-independent word sets
    "rf35",
    # quarantine apply: one scan + event_id window
    "dq8",
    # weighted median: price-grain windows; IVM fuzz: generated data
    "a12", "rf36",
    # --- round-11 widening: every exclusion must name its superlinear
    # oracle construct, so everything below is audited at 100x too ---
    # ALL rf fuzz rows: generated sf-independent data (replaces the
    # one-by-one rf entries above; rf1-rf26 were excluded only by
    # omission)
    "rf",
    # NOT ddf1-ddf4: their twin corpora are documents-table SLICES (they
    # scale with the replica) under brute-force all-pairs oracles —
    # ddf2's edit oracle blew the 150 s referee at 100x, and ddf1's
    # exact-equality gate is INVALID at replica scale for an approximate
    # LSH pipeline (measured: 2 of 4,212,749 true pairs dropped at 100x
    # — banding recall, not a bug; the construction is calibrated at
    # gate scale where both found/rejected twin arms are deterministic).
    # ddf5's splice oracle is linear and stays in.
    "ddf5",
    # exact-hash dedup: one md5 group-by, linear (unlike dd2-dd12's
    # brute-force-Jaccard / recursive-CTE-closure oracles)
    "dd1_",
    # expression/cast/function projections: per-row outputs, linear in
    # the replica (most scan generated frames or %-filtered lineitem);
    # covers e1-e32, the b-variants, e12_cast_*, e16, and ep1 — matched
    # by ANCHORED regex below (a bare "e" prefix would silently classify
    # any future e-named query as linear)
    # set ops / projections / sampling over full tables: linear outputs
    "r3", "r4", "r5", "r6", "r7b", "r8", "r9",
    # join-semantics rows with LINEAR output (semi/anti return at most
    # the left side; the inner/left/right/full/cross/salted r2 rows stay
    # excluded — their %100-key construction makes output quadratic in
    # the replica factor, 2e11 rows at 100x)
    "r2_join_semi", "r2_join_anti",
    # TPC-H q4: EXISTS decorrelates to a semi join in both engines
    "q4",
    # single-scan analytics: histogram, MAD outliers, pivot/unpivot,
    # PSI drift, JSON extract/parse, LOO encode, frame pipeline,
    # token-window chunking, BM25 / hybrid RRF (postings + one query's
    # cosine pass), SQL frontdoor, epoch shuffle
    "h1", "od1", "p1", "p2", "dq1", "j1", "j2", "fe1", "fr1", "ch1",
    "bm1", "bm2", "sql1",
    # resample/gap-fill: output = keys x days, linear
    "ts1", "ts2",
    # format round-trips: write+read the orders replica (linear, just
    # IO-heavy)
    "io",
    # multimodal meta walks over planted payloads: per-doc byte
    # arithmetic (mm5/mm6 were audited at 10x but missing from the
    # bounded tuple by omission)
    "mm1", "mm2", "mm3", "mm4", "mm5", "mm6",
    # Every remaining exclusion names its superlinear construct:
    # brute-force all-pairs Jaccard/edit/cosine oracles (cur6, dd2-dd6,
    # dd9-dd12, dd19-dd20, fj1, fj2, s10, sj1-sj4, sql2), recursive-CTE
    # transitive closure (dd7, dd8, dd17, dd18, s8), quadratic %100-key
    # join output (r2 inner/left/right/full/cross/salted), query side
    # growing with the corpus (ss6), and ss7's 3-way-cross window argmax
    # past the 150 s bounded referee (audited unbounded at 10x).
    # exhaustive ANN twins: 5 queries x corpus cosine passes, linear
    # (ss6_knn_join stays excluded: its query side is every 10th vector,
    # so the oracle is |corpus|^2/10 at any replica; ss7 stays excluded
    # for its 3-way-cross window argmax past the 150s bounded referee)
    "ss1_", "ss2x", "ss4", "ss5")


def main():
    args = [a for a in sys.argv[1:] if a != "--bounded"]
    bounded = "--bounded" in sys.argv
    replica = args[0] if args else "/tmp/sfx10"
    out = "/tmp/graft-replica-audit"
    oracle = json.loads((REPO / "ORACLE_SQL.json").read_text())
    keep = sorted(n for n in oracle
                  if not n.startswith(("dd", "ss", "mm", "fj", "sj1", "sj2", "sj3",
                                       # sj5 is oracle-identical to sj3
                                       # (all-pairs, quadratic in the
                                       # replica factor)
                                       "sj5",
                                       "sql2", "cur6", "s8_", "s10"))) + [
        "ss1_cosine_topk", "dd13_span_dedup", "ss2_ann_lsh", "ss3_ann_ivf",
        "ss1b_cosine_topk_indexed", "dd15_substring_dedup", "dd16_substring_cut",
        "ddf5_span_splice", "mm5_wav_meta",
        "mm6_mp4_meta", "dd21_cdc_chunks",
        "mm7_warc_meta", "ss7_ann_ivfpq",
        "mm8_tar_meta", "mm9_webdataset_members",
        "dd22_cdc_cut", "ss8_filtered_ann",
        # round-11: linear-oracle rows inside excluded prefixes
        "dd1_dedup_exact",
        "mm1_image_meta", "mm2_frame_sample", "mm3_resize_meta",
        "mm4_audio_features",
        "ss2x_lsh_exhaustive", "ss4_ivf_exhaustive",
        "ss5_pq_exhaustive"]  # linear oracles in excluded prefixes
    if bounded:
        # anchored ^e<digit> for the expression family (e1..e32, e12_*,
        # ep1 is listed via its own prefix rule below) — see the comment
        # at the "e" slot in BOUNDED_PREFIXES
        keep = [n for n in keep
                if n.startswith(BOUNDED_PREFIXES)
                or re.match(r"^ep?\d", n)]
    keep = sorted(set(keep))
    print(f"[audit] {len(keep)} queries at {replica}", flush=True)
    subprocess.run(["rm", "-rf", out], check=True)
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {replica} {out} {','.join(keep)}"],
        cwd=REPO)
    if r.returncode != 0:
        raise SystemExit("verify run failed")
    # timeout-guarded referee: a superlinear DuckDB oracle (correlated
    # subquery, token explosion) reports SKIP instead of hanging the audit.
    # At 10x every kept oracle is known-linear-ish, so give the borderline
    # ones (cur2's gram self-join sits near 150s) headroom; the tight
    # budget is for the 100x bounded run where superlinear = runaway.
    referee_timeout = "150" if bounded else "400"
    chk = subprocess.run(
        ["python3", "tools/check_timeout.py", replica, out, referee_timeout],
        cwd=REPO, capture_output=True, text=True)
    lines = chk.stdout.splitlines()
    missing_ok = {n for n in oracle} - set(keep)
    real_fail = [l for l in lines if l.startswith("FAIL")
                 and l.split()[1] not in missing_ok]
    skipped = [l.split()[1] for l in lines if l.startswith("SKIP")]
    n_pass = sum(1 for l in lines if l.startswith("PASS"))
    print(f"[audit] {n_pass} pass, {len(real_fail)} fail, "
          f"{len(skipped)} oracle-timeout skips "
          f"({len(missing_ok)} excluded quadratic-oracle queries)")
    for l in real_fail:
        print("[audit] " + l)
    # committed artifact: which replica, which HEAD, what passed — the
    # round loop regenerates this next to CORRECTNESS so partition-count-
    # dependent regressions can't land green (the AllTuples class)
    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()
    scale = Path(replica).name.replace("sfx", "") + "x" \
        if "sfx" in Path(replica).name else Path(replica).name
    # provenance: actual replica size, so the artifact can't silently
    # describe a different dataset than the one audited
    def lineitem_rows():
        try:
            import pyarrow.parquet as pq
            p = Path(replica) / "lineitem.parquet"
            files = [p] if p.is_file() else sorted(p.glob("*.parquet"))
            return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        except Exception:
            return None
    artifact = {
        "metric": "replica_audit", "replica": replica, "scale": scale,
        "lineitem_rows": lineitem_rows(),
        "bounded": bounded, "head": head, "generated_unix": int(time.time()),
        "queries_run": len(keep), "pass": n_pass,
        "fail": [l.split()[1] for l in real_fail], "oracle_timeout_skip": skipped,
        "excluded_quadratic_oracle": len(missing_ok),
    }
    dest = REPO / f"REPLICA_AUDIT_{scale}.json"
    dest.write_text(json.dumps(artifact, indent=2) + "\n")
    print(f"[audit] wrote {dest}", flush=True)
    raise SystemExit(1 if real_fail else 0)


if __name__ == "__main__":
    main()
