package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Corpus, DsirSelection, PrefixSum, TextAnalysis}
import graft.sources.Tables

/** Data-selection operators for training-corpus curation: hashed n-gram
  * importance resampling (the DSIR recipe — Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling") and the
  * signed hashing trick (Weinberger et al. 2009, "Feature Hashing for
  * Large Scale Multitask Learning").
  *
  * Everything is integer fixed-point over md5-derived buckets so the
  * DuckDB oracle replays each pipeline bit-for-bit: Spark
  * `conv(substr(md5(x),1,k),16,10)` == DuckDB
  * `CAST(('0x'||substr(md5(x),1,k)) AS UBIGINT)` (lowercase hex in both
  * engines; k<=12 hex chars stay inside int64).
  *
  * Ref: the reference (slide/utils.py) has no corpus-selection surface;
  * these extend the curation family (cur, fe) per the north-star scope.
  */
object SelectionOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Per-(doc, hashed-bigram-bucket) counts — the shared DSIR kernel's
    * feature pass ([[graft.operators.DsirSelection]]). 256 buckets: the
    * feature space is CONSTANT-grain, which is the whole point of the
    * hashing trick at 100 TB — the target/raw distributions below are
    * 256-row frames no matter the corpus size.
    */
  private def hashedBigramCounts(docs: DataFrame): DataFrame =
    DsirSelection.hashedBigramCounts(docs)

  private val featPrelude: String =
    """ws AS (SELECT doc_id, source,
      |        string_split(trim(regexp_replace(text,'\s+',' ','g')),' ') AS w
      |        FROM documents WHERE trim(text) <> ''),
      |bi AS (SELECT doc_id, source, w[i] || ' ' || w[i+1] AS g FROM ws,
      |        LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) _t),
      |fb AS (SELECT doc_id, source,
      |         CAST(CAST(('0x'||substr(md5(g),1,4)) AS UBIGINT) % 256 AS BIGINT) AS b,
      |         count(*) AS cnt
      |        FROM bi GROUP BY 1,2,3)""".stripMargin

  /** (doc_id, score_pm) for every raw-pool document: the DSIR importance
    * score as the count-weighted mean of the per-bucket smoothed
    * target/raw probability ratio in permille. Shared by imp1 (top-k),
    * imp2 (resample) and imp3 (end-to-end shard build). Scale shape: the
    * ratio table is a CONSTANT 256 rows (broadcast); the corpus is
    * touched by one explode + two aggregates.
    */
  private final case class Dsir(fb: DataFrame, tgt: DataFrame,
      tgtTot: DataFrame, rawB: DataFrame, rawTot: DataFrame,
      scored: DataFrame)

  private def dsir(s: SparkSession, dir: String): Dsir = {
    val fb = hashedBigramCounts(t(s, dir, "documents")).localCheckpoint()
    val tgtF = fb.filter(col("source") === "src0")
    val rawF = fb.filter(col("source") =!= "src0")
    val tgt = tgtF.groupBy("b").agg(sum(col("cnt")).as("tc"))
    val tgtTot = tgtF.agg(sum(col("cnt")).as("tgt_tot"))
    val rawB = rawF.groupBy("b").agg(sum(col("cnt")).as("rc"))
    val rawTot = rawF.agg(sum(col("cnt")).as("raw_tot"))
    // ratio + scoring via the shared kernel (the r table is identical to
    // rawB left-join tgt with zero-filled tc: bucketState zero-fills and
    // ratioTable keeps rc > 0 buckets — the rawB bucket set)
    val scored = DsirSelection.scoreDocs(fb,
      DsirSelection.ratioTable(DsirSelection.bucketState(fb)))
    Dsir(fb, tgt, tgtTot, rawB, rawTot, scored)
  }

  private def dsirScored(s: SparkSession, dir: String): DataFrame =
    dsir(s, dir).scored

  /** Deterministic importance RESAMPLE (the actual "R" of DSIR): accept
    * a document iff its content-independent md5 permille draw falls
    * below score_pm scaled to [0,1000] by the global max — a
    * hash-rejection Bernoulli thinning with acceptance probability
    * proportional to the importance weight (the cur-series hash-gate
    * shape), so the decision is reproducible on any cluster at any
    * parallelism. The max is a 1-row broadcast.
    */
  private def dsirSelected(scored: DataFrame): DataFrame =
    DsirSelection.resample(scored)

  /** Oracle CTE chain up to `scored(doc_id, score_pm)` — the SQL replay
    * of [[dsirScored]].
    */
  private val scorePrelude: String =
    s"""$featPrelude,
      |tgt AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS tc FROM fb
      |        WHERE source = 'src0' GROUP BY 1),
      |tt AS (SELECT CAST(sum(cnt) AS BIGINT) AS tgt_tot FROM fb WHERE source = 'src0'),
      |rawb AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS rc FROM fb
      |         WHERE source <> 'src0' GROUP BY 1),
      |rt AS (SELECT CAST(sum(cnt) AS BIGINT) AS raw_tot FROM fb WHERE source <> 'src0'),
      |r AS (SELECT rawb.b,
      |        CAST((CAST(COALESCE(tgt.tc, 0) + 1 AS HUGEINT) * raw_tot * 1000) //
      |             (CAST(rawb.rc + 1 AS HUGEINT) * tgt_tot) AS BIGINT) AS r_pm
      |      FROM rawb LEFT JOIN tgt ON tgt.b = rawb.b, tt, rt),
      |scored AS (SELECT fb.doc_id,
      |        CAST(CAST(sum(fb.cnt * r.r_pm) AS HUGEINT) //
      |             CAST(sum(fb.cnt) AS HUGEINT) AS BIGINT) AS score_pm
      |      FROM fb JOIN r ON r.b = fb.b
      |      WHERE fb.source <> 'src0'
      |      GROUP BY 1)""".stripMargin

  /** SQL replay of [[dsirSelected]]'s draw and acceptance threshold. */
  private val drawSql =
    "CAST(CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4)) AS UBIGINT) % 1000 AS BIGINT)"
  private val acceptSql =
    "CAST(score_pm * 1000 // greatest(max_pm, 1) AS BIGINT)"

  def all: Seq[Q] = Seq(

    // IMP1 — DSIR-style importance resampling: fit hashed-bigram bag
    // models on a target domain (source 'src0') and on the raw pool
    // (everything else), weight each raw document by how target-like its
    // feature counts are, keep the top 50. The per-bucket weight is the
    // add-one-smoothed probability ratio in permille,
    //   r(b) = ((tgt(b)+1) * raw_tot * 1000) div ((raw(b)+1) * tgt_tot),
    // and the document score is the count-weighted mean of r over its
    // buckets — a monotone linear proxy of DSIR's log-likelihood-ratio
    // sum that stays in exact integer arithmetic (no log, no floats), so
    // both engines rank identically. The ratio numerator is a product of
    // two corpus-grain sums → computed in Decimal(38,0) on the Spark side
    // (HUGEINT in DuckDB) per the silent-int64-wrap convention.
    //
    // Scale shape: features are one explode + one (doc,b) aggregate; the
    // two distribution frames are 256 rows (constant), broadcast into the
    // doc-grain scoring join; top-50 is TakeOrdered. Nothing here is more
    // than one pass over the corpus — the DSIR paper's selling point,
    // kept intact.
    Q("imp1_dsir_select",
      (s, dir) =>
        dsirScored(s, dir)
          .orderBy(col("score_pm").desc, col("doc_id"))
          .limit(50),
      Some(s"""WITH $scorePrelude
        |SELECT doc_id, score_pm FROM scored
        |ORDER BY score_pm DESC, doc_id
        |LIMIT 50""".stripMargin)),

    // IMP2 — the RESAMPLING half of DSIR (Xie 2023 §2 step 3): turn the
    // importance scores into an actual selected subset by deterministic
    // hash-rejection — accept doc iff md5(doc_id) permille draw <
    // score_pm·1000/max(score_pm). Acceptance probability is
    // proportional to the importance weight, the draw is content-keyed
    // and cluster-invariant, and the whole decision is one broadcast
    // 1-row max + one filter on the doc-grain score frame — selection
    // composes with any downstream pipeline without a shuffle.
    Q("imp2_dsir_resample",
      (s, dir) =>
        dsirSelected(dsirScored(s, dir))
          .select("doc_id", "score_pm", "accept_pm", "draw_pm")
          .orderBy("doc_id"),
      Some(s"""WITH $scorePrelude,
        |mx AS (SELECT MAX(score_pm) AS max_pm FROM scored)
        |SELECT doc_id, score_pm, $acceptSql AS accept_pm, $drawSql AS draw_pm
        |FROM scored, mx
        |WHERE $drawSql < $acceptSql
        |ORDER BY doc_id""".stripMargin)),

    // IMP3 — the full "build a training shard" composition, one
    // declarative plan: DSIR selection (imp2's hash-rejection) → global
    // sequence packing of the survivors into 512-token windows (pk1's
    // two-pass PrefixSum — no single-partition Window) → per-source
    // temperature-mix accounting (cur7's α=1/2 rule) over the packed
    // shard. Output: per source, docs/tokens/window-slots plus raw and
    // temperature-scaled sampling shares.
    //
    // Shuffle ledger vs the sum of parts (plan in PLANS.md): feature
    // explode + (doc,b) aggregate [1 shuffle], doc-grain score aggregate
    // [1], selection filter [broadcast, 0], token join back to documents
    // [1, doc_id-keyed], PrefixSum range sort [1] + #partitions-row
    // totals exchange, source-grain aggregate [1] + source-cardinality
    // window — exactly the shuffles its three parts pay alone; the
    // composition adds none.
    Q("imp3_select_pack_mix",
      (s, dir) => {
        val L = 512
        val docs = t(s, dir, "documents")
        val sel = dsirSelected(dsirScored(s, dir)).select("doc_id")
        val toks = docs.join(sel, Seq("doc_id"))
          .select(col("doc_id"), col("source"),
            TextAnalysis.tokenCount(col("text")).as("n_tokens"))
          .filter(col("n_tokens") > 0)
        val packed = PrefixSum.exclusive(toks, "doc_id", "n_tokens", "tok_offset")
          .withColumn("first_win", expr(s"tok_offset div $L"))
          .withColumn("last_win", expr(s"(tok_offset + n_tokens - 1) div $L"))
        val perSrc = packed.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("tot_tokens"),
            sum(col("last_win") - col("first_win") + lit(1)).as("win_slots"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy().rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        perSrc
          .withColumn("grand", sum("tot_tokens").over(w))
          .withColumn("share_ppm",
            expr("CAST(tot_tokens * 1000000 div grand AS BIGINT)"))
          .withColumn("root",
            expr("CAST(FLOOR(SQRT(CAST(share_ppm AS DOUBLE))) AS BIGINT)"))
          .withColumn("root_sum", sum("root").over(w))
          .select(col("source"), col("n_docs"), col("tot_tokens"),
            col("win_slots"), col("share_ppm"),
            expr("CAST(root * 1000000 div root_sum AS BIGINT)").as("sampled_ppm"))
          .orderBy("source")
      },
      Some(s"""WITH $scorePrelude,
        |mx AS (SELECT MAX(score_pm) AS max_pm FROM scored),
        |sel AS (SELECT doc_id FROM scored, mx WHERE $drawSql < $acceptSql),
        |tk AS (SELECT d.doc_id, d.source, d.n_tokens
        |       FROM (SELECT doc_id, source, CAST(CASE WHEN nrm = '' THEN 0
        |          ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END AS BIGINT) AS n_tokens
        |         FROM (SELECT doc_id, source,
        |            trim(regexp_replace(text, '\\s+', ' ', 'g')) AS nrm
        |           FROM documents)) d
        |       JOIN sel USING (doc_id)
        |       WHERE d.n_tokens > 0),
        |packed AS (SELECT doc_id, source, n_tokens,
        |        SUM(n_tokens) OVER (ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS tok_offset
        |       FROM tk),
        |per AS (SELECT source, COUNT(*) AS n_docs,
        |        CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
        |        CAST(SUM((tok_offset + n_tokens - 1) // 512 - tok_offset // 512 + 1) AS BIGINT) AS win_slots
        |       FROM packed GROUP BY 1)
        |SELECT source, n_docs, tot_tokens, win_slots, share_ppm,
        |  CAST(root * 1000000 // SUM(root) OVER () AS BIGINT) AS sampled_ppm
        |FROM (
        | SELECT source, n_docs, tot_tokens, win_slots, share_ppm,
        |  CAST(FLOOR(SQRT(CAST(share_ppm AS DOUBLE))) AS BIGINT) AS root
        | FROM (
        |  SELECT source, n_docs, tot_tokens, win_slots,
        |   CAST(tot_tokens * 1000000 // SUM(tot_tokens) OVER () AS BIGINT) AS share_ppm
        |  FROM per))
        |ORDER BY source""".stripMargin)),

    // IMP4 — dedup-aware selection audit: per source, how many
    // DSIR-selected documents are exact duplicates (md5-of-lowered-text
    // key occurring >= 2 times anywhere in the corpus). Importance
    // resampling upweights target-like text, and boilerplate that
    // happens to look target-like gets selected MANY times over — this
    // is the observability row that catches selection concentrating
    // duplicate mass (the reason DSIR pipelines run dedup after
    // selection). Plan: the dup-key table is one hash aggregate, the
    // audit one key-equi join + source-grain aggregate; nothing
    // all-pairs, joins unhinted so AQE sizes them.
    Q("imp4_select_dedup_overlap",
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val sel = dsirSelected(dsirScored(s, dir)).select("doc_id")
        val dup = docs.groupBy(md5(lower(col("text"))).as("k"))
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
          .select(col("k"), lit(1L).as("isdup"))
        docs.join(sel, Seq("doc_id"))
          .withColumn("k", md5(lower(col("text"))))
          .join(dup, Seq("k"), "left")
          .groupBy("source")
          .agg(count(lit(1)).as("n_sel"),
            sum(coalesce(col("isdup"), lit(0L))).as("n_sel_dup"))
          .select(col("source"), col("n_sel"), col("n_sel_dup"),
            expr("CAST(n_sel_dup * 1000 div n_sel AS BIGINT)").as("dup_pm"))
          .orderBy(asc_nulls_first("source"))
      },
      Some(s"""WITH $scorePrelude,
        |mx AS (SELECT MAX(score_pm) AS max_pm FROM scored),
        |sel AS (SELECT doc_id FROM scored, mx WHERE $drawSql < $acceptSql),
        |dk AS (SELECT md5(lower(text)) AS k FROM documents
        |       GROUP BY 1 HAVING count(*) >= 2)
        |SELECT d.source, COUNT(*) AS n_sel,
        | CAST(SUM(CASE WHEN dk.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_sel_dup,
        | CAST(CAST(SUM(CASE WHEN dk.k IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000
        |   // COUNT(*) AS BIGINT) AS dup_pm
        |FROM documents d
        |JOIN sel USING (doc_id)
        |LEFT JOIN dk ON dk.k = md5(lower(d.text))
        |GROUP BY 1
        |ORDER BY source NULLS FIRST""".stripMargin)),

    // IMP5 — selection-shift evaluation: L1 distance (in ppm, over the
    // 256 hashed-bigram buckets) between the target, raw-pool, and
    // DSIR-selected feature distributions — the "did selection actually
    // move the corpus toward the target domain" scalar (Xie 2023 §4
    // evaluates selection the same way, via feature-space divergence;
    // L1 instead of KL keeps it in exact integer arithmetic). Expected
    // invariant: l1_sel_tgt < l1_raw_tgt. Everything after the shared
    // feature pass is 256-row-frame algebra; the spine keeps buckets
    // with zero mass in one distribution comparable.
    Q("imp5_selection_shift",
      (s, dir) => {
        val d = dsir(s, dir)
        val sel = dsirSelected(d.scored).select("doc_id")
        val selF = d.fb.join(sel, Seq("doc_id"))
        val selB = selF.groupBy("b").agg(sum(col("cnt")).as("sc"))
        val selTot = selF.agg(sum(col("cnt")).as("sel_tot"))
        val spine = s.range(256).select(col("id").as("b"))
        spine
          .join(d.tgt, Seq("b"), "left")
          .join(d.rawB, Seq("b"), "left")
          .join(selB, Seq("b"), "left")
          .crossJoin(broadcast(d.tgtTot)).crossJoin(broadcast(d.rawTot))
          .crossJoin(broadcast(selTot))
          .select(
            expr("CAST(CAST(coalesce(tc, 0) AS DECIMAL(38,0)) * 1000000 div tgt_tot AS BIGINT)").as("pt"),
            expr("CAST(CAST(coalesce(rc, 0) AS DECIMAL(38,0)) * 1000000 div raw_tot AS BIGINT)").as("pr"),
            expr("CAST(CAST(coalesce(sc, 0) AS DECIMAL(38,0)) * 1000000 div sel_tot AS BIGINT)").as("ps"))
          .agg(
            expr("CAST(sum(abs(pr - pt)) AS BIGINT)").as("l1_raw_tgt_ppm"),
            expr("CAST(sum(abs(ps - pt)) AS BIGINT)").as("l1_sel_tgt_ppm"),
            expr("CAST(sum(abs(ps - pr)) AS BIGINT)").as("l1_sel_raw_ppm"))
          .orderBy("l1_raw_tgt_ppm")
      },
      Some(s"""WITH $scorePrelude,
        |mx AS (SELECT MAX(score_pm) AS max_pm FROM scored),
        |sel AS (SELECT doc_id FROM scored, mx WHERE $drawSql < $acceptSql),
        |selc AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS sc FROM fb
        |         JOIN sel USING (doc_id) GROUP BY 1),
        |st AS (SELECT CAST(sum(cnt) AS BIGINT) AS sel_tot FROM fb
        |       JOIN sel USING (doc_id)),
        |spine AS (SELECT unnest(generate_series(0, 255)) AS b),
        |dist AS (SELECT
        |   CAST(CAST(COALESCE(t.tc, 0) AS HUGEINT) * 1000000 // tt.tgt_tot AS BIGINT) AS pt,
        |   CAST(CAST(COALESCE(rb.rc, 0) AS HUGEINT) * 1000000 // rt.raw_tot AS BIGINT) AS pr,
        |   CAST(CAST(COALESCE(sc.sc, 0) AS HUGEINT) * 1000000 // st.sel_tot AS BIGINT) AS ps
        |  FROM spine sp
        |  LEFT JOIN tgt t ON t.b = sp.b
        |  LEFT JOIN rawb rb ON rb.b = sp.b
        |  LEFT JOIN selc sc ON sc.b = sp.b, tt, rt, st)
        |SELECT CAST(SUM(ABS(pr - pt)) AS BIGINT) AS l1_raw_tgt_ppm,
        |       CAST(SUM(ABS(ps - pt)) AS BIGINT) AS l1_sel_tgt_ppm,
        |       CAST(SUM(ABS(ps - pr)) AS BIGINT) AS l1_sel_raw_ppm
        |FROM dist
        |ORDER BY l1_raw_tgt_ppm""".stripMargin)),

    // PK2 — packing-efficiency report: how many 512-token training
    // windows the corpus needs under one-doc-per-window-set padding
    // (sum of per-doc ceils) vs pk1's concat-then-chunk stream
    // (one global ceil), and the padding waste of each in ppm — the
    // numbers that justify sequence packing in the first place (the
    // delta IS the GPU-hours saved). One aggregate over token counts.
    Q("pk2_pack_efficiency",
      (s, dir) =>
        t(s, dir, "documents")
          .select(TextAnalysis.tokenCount(col("text")).as("n"))
          .filter(col("n") > 0)
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n")).as("total_tokens"),
            sum(expr("(n + 511) div 512")).as("padded_windows"))
          .select(col("n_docs"), col("total_tokens"), col("padded_windows"),
            expr("CAST((total_tokens + 511) div 512 AS BIGINT)").as("concat_windows"),
            expr("CAST((padded_windows * 512 - total_tokens) * 1000 div (padded_windows * 512) AS BIGINT)")
              .as("waste_padded_pm"),
            expr("CAST((((total_tokens + 511) div 512) * 512 - total_tokens) * 1000 div (((total_tokens + 511) div 512) * 512) AS BIGINT)")
              .as("waste_concat_pm"))
          .orderBy("n_docs"),
      Some(s"""WITH tk AS (SELECT CAST(CASE WHEN nrm = '' THEN 0
        |    ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END AS BIGINT) AS n
        |  FROM (SELECT trim(regexp_replace(text, '\\s+', ' ', 'g')) AS nrm
        |    FROM documents)),
        |agg AS (SELECT COUNT(*) AS n_docs,
        |    CAST(SUM(n) AS BIGINT) AS total_tokens,
        |    CAST(SUM((n + 511) // 512) AS BIGINT) AS padded_windows
        |  FROM tk WHERE n > 0)
        |SELECT n_docs, total_tokens, padded_windows,
        |  CAST((total_tokens + 511) // 512 AS BIGINT) AS concat_windows,
        |  CAST((padded_windows * 512 - total_tokens) * 1000 // (padded_windows * 512) AS BIGINT) AS waste_padded_pm,
        |  CAST((((total_tokens + 511) // 512) * 512 - total_tokens) * 1000 // (((total_tokens + 511) // 512) * 512) AS BIGINT) AS waste_concat_pm
        |FROM agg
        |ORDER BY n_docs""".stripMargin)),

    // IMP6 — pairwise domain-AFFINITY matrix: L1 distance (ppm over the
    // 256 hashed-bigram buckets) between every pair of source content
    // distributions — the input to curriculum ordering and to choosing
    // transfer sources for a low-resource target domain (an4 is the
    // one-vs-corpus column of this matrix). One corpus feature pass;
    // the matrix itself is (sources² × 256) bounded-frame algebra —
    // quadratic only in the SOURCE CATALOG (~10²-10³), never the corpus.
    Q("imp6_domain_affinity",
      (s, dir) => {
        val fb = hashedBigramCounts(t(s, dir, "documents")).localCheckpoint()
        val stot = fb.groupBy("source").agg(sum(col("cnt")).as("tot"))
        val d = stot
          .crossJoin(s.range(256).select(col("id").as("b")))
          .join(fb.groupBy("source", "b").agg(sum(col("cnt")).as("c")),
            Seq("source", "b"), "left")
          .select(col("source"), col("b"),
            expr("CAST(CAST(coalesce(c, 0) AS DECIMAL(38,0)) * 1000000 div tot AS BIGINT)").as("p"))
        d.select(col("source").as("src_a"), col("b"), col("p").as("pa"))
          .join(d.select(col("source").as("src_b"), col("b"), col("p").as("pb")),
            Seq("b"))
          .filter(col("src_a") < col("src_b"))
          .groupBy("src_a", "src_b")
          .agg(expr("CAST(sum(abs(pa - pb)) AS BIGINT)").as("l1_ppm"))
          .orderBy("l1_ppm", "src_a", "src_b")
      },
      Some(s"""WITH $featPrelude,
        |stot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot FROM fb GROUP BY 1),
        |pc AS (SELECT source, b, CAST(sum(cnt) AS BIGINT) AS c FROM fb GROUP BY 1, 2),
        |spine AS (SELECT stot.source, stot.tot, sb.b
        |          FROM stot, (SELECT unnest(generate_series(0, 255)) AS b) sb),
        |d AS (SELECT spine.source, spine.b,
        |    CAST(CAST(COALESCE(pc.c, 0) AS HUGEINT) * 1000000 // spine.tot AS BIGINT) AS p
        |  FROM spine LEFT JOIN pc ON pc.source = spine.source AND pc.b = spine.b)
        |SELECT a.source AS src_a, b2.source AS src_b,
        |  CAST(SUM(ABS(a.p - b2.p)) AS BIGINT) AS l1_ppm
        |FROM d a JOIN d b2 ON a.b = b2.b AND a.source < b2.source
        |GROUP BY 1, 2
        |ORDER BY l1_ppm, src_a, src_b""".stripMargin)),

    // AN4 — per-source feature DRIFT: L1 distance (ppm over the 256
    // hashed-bigram buckets) between each source's content distribution
    // and the corpus-wide one — the ingest observability row that flags
    // a source whose content changed shape (contamination, encoding
    // bug, a crawler gone off-domain) without reading any of it twice.
    // One corpus feature pass; everything after is (sources × 256)
    // bounded-frame algebra with the global distribution broadcast.
    Q("an4_source_drift",
      (s, dir) => {
        val fb = hashedBigramCounts(t(s, dir, "documents")).localCheckpoint()
        val perSrc = fb.groupBy("source", "b").agg(sum(col("cnt")).as("c"))
        val srcTot = fb.groupBy("source").agg(sum(col("cnt")).as("tot"))
        val glob = fb.groupBy("b").agg(sum(col("cnt")).as("gc"))
        val globTot = fb.agg(sum(col("cnt")).as("gt"))
        srcTot
          .crossJoin(s.range(256).select(col("id").as("b")))
          .join(perSrc, Seq("source", "b"), "left")
          .join(broadcast(glob), Seq("b"), "left")
          .crossJoin(broadcast(globTot))
          .select(col("source"),
            expr("CAST(CAST(coalesce(c, 0) AS DECIMAL(38,0)) * 1000000 div tot AS BIGINT)").as("ps"),
            expr("CAST(CAST(coalesce(gc, 0) AS DECIMAL(38,0)) * 1000000 div gt AS BIGINT)").as("pg"))
          .groupBy("source")
          .agg(expr("CAST(sum(abs(ps - pg)) AS BIGINT)").as("l1_ppm"))
          .orderBy(col("l1_ppm").desc, col("source"))
      },
      Some(s"""WITH $featPrelude,
        |ps AS (SELECT source, b, CAST(sum(cnt) AS BIGINT) AS c FROM fb GROUP BY 1, 2),
        |stot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS tot FROM fb GROUP BY 1),
        |g AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS gc FROM fb GROUP BY 1),
        |gt AS (SELECT CAST(sum(cnt) AS BIGINT) AS gt FROM fb),
        |spine AS (SELECT stot.source, stot.tot, sb.b
        |          FROM stot, (SELECT unnest(generate_series(0, 255)) AS b) sb)
        |SELECT spine.source,
        | CAST(SUM(ABS(CAST(CAST(COALESCE(ps.c, 0) AS HUGEINT) * 1000000 // spine.tot AS BIGINT)
        |            - CAST(CAST(COALESCE(g.gc, 0) AS HUGEINT) * 1000000 // gt.gt AS BIGINT))) AS BIGINT) AS l1_ppm
        |FROM spine
        |LEFT JOIN ps ON ps.source = spine.source AND ps.b = spine.b
        |LEFT JOIN g ON g.b = spine.b, gt
        |GROUP BY 1
        |ORDER BY l1_ppm DESC, spine.source""".stripMargin)),

    // RF31 — DSIR-selection differential fuzz, the rf27-rf30 pattern
    // for the new family: 5 seeds × 200 md5-constructed documents over
    // a 20-word vocabulary (8 sources, src0 the target), the
    // DsirSelection kernel end-to-end (features → bucket state → ratio
    // → score → resample) vs the oracle's full SQL replay over the
    // IDENTICAL generate_series-derived corpus. Catches any divergence
    // the fixed gate corpus can't reach (empty buckets, single-bigram
    // docs, ties in the max).
    Q("rf31_dsir_fuzz",
      (s, dir) => {
        val insts = Seq(0L, 100L, 200L, 300L, 400L).map { off =>
          val docs = s.range(1, 201).select(
            col("id").as("doc_id"),
            concat(lit("src"), (col("id") % 8).cast("string")).as("source"),
            expr(s"""concat_ws(' ', transform(sequence(1, 6 + CAST(id % 5 AS INT)),
                     j -> concat('w', CAST(CAST(conv(substring(md5(
                            concat('D$off:', CAST(id AS STRING), ':', CAST(j AS STRING))
                          ), 1, 6), 16, 10) AS BIGINT) % 20 AS STRING))))""").as("text"))
          val fb = DsirSelection.hashedBigramCounts(docs)
          val sel = DsirSelection.resample(DsirSelection.scoreDocs(fb,
            DsirSelection.ratioTable(DsirSelection.bucketState(fb))))
          sel.select(lit(off).as("seedoff"), col("doc_id"), col("score_pm"),
            col("accept_pm"), col("draw_pm"))
        }
        insts.reduce(_.unionByName(_)).orderBy("seedoff", "doc_id")
      },
      Some {
        def chain(off: Long, x: String): String =
          s"""d$x AS (SELECT i AS doc_id, 'src' || CAST(i % 8 AS VARCHAR) AS source
             |  FROM generate_series(1, 200) _i(i)),
             |ws$x AS (SELECT d$x.doc_id, d$x.source, list('w' || CAST(
             |    CAST(('0x'||substr(md5('D$off:'||CAST(d$x.doc_id AS VARCHAR)||':'||CAST(j AS VARCHAR)),1,6)) AS UBIGINT) % 20
             |    AS VARCHAR) ORDER BY j) AS w
             |  FROM d$x, LATERAL (SELECT unnest(generate_series(1, 6 + d$x.doc_id % 5)) AS j) _j
             |  GROUP BY 1, 2),
             |bi$x AS (SELECT doc_id, source, w[i] || ' ' || w[i+1] AS g FROM ws$x,
             |  LATERAL (SELECT unnest(generate_series(1, len(w)-1)) AS i) _t),
             |fb$x AS (SELECT doc_id, source,
             |    CAST(CAST(('0x'||substr(md5(g),1,4)) AS UBIGINT) % 256 AS BIGINT) AS b,
             |    count(*) AS cnt FROM bi$x GROUP BY 1,2,3),
             |tgt$x AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS tc FROM fb$x
             |    WHERE source = 'src0' GROUP BY 1),
             |tt$x AS (SELECT CAST(sum(cnt) AS BIGINT) AS tgt_tot FROM fb$x WHERE source = 'src0'),
             |rawb$x AS (SELECT b, CAST(sum(cnt) AS BIGINT) AS rc FROM fb$x
             |    WHERE source <> 'src0' GROUP BY 1),
             |rt$x AS (SELECT CAST(sum(cnt) AS BIGINT) AS raw_tot FROM fb$x WHERE source <> 'src0'),
             |r$x AS (SELECT rawb$x.b,
             |    CAST((CAST(COALESCE(tgt$x.tc, 0) + 1 AS HUGEINT) * raw_tot * 1000) //
             |         (CAST(rawb$x.rc + 1 AS HUGEINT) * tgt_tot) AS BIGINT) AS r_pm
             |  FROM rawb$x LEFT JOIN tgt$x ON tgt$x.b = rawb$x.b, tt$x, rt$x),
             |sc$x AS (SELECT fb$x.doc_id,
             |    CAST(CAST(sum(fb$x.cnt * r$x.r_pm) AS HUGEINT) //
             |         CAST(sum(fb$x.cnt) AS HUGEINT) AS BIGINT) AS score_pm
             |  FROM fb$x JOIN r$x ON r$x.b = fb$x.b
             |  WHERE fb$x.source <> 'src0' GROUP BY 1),
             |mx$x AS (SELECT MAX(score_pm) AS max_pm FROM sc$x)""".stripMargin
        val offs = Seq(0L, 100L, 200L, 300L, 400L)
        val withs = offs.zipWithIndex
          .map { case (off, i) => chain(off, s"_$i") }.mkString(",\n")
        val union = offs.zipWithIndex.map { case (off, i) =>
          val x = s"_$i"
          s"""SELECT CAST($off AS BIGINT) AS seedoff, doc_id, score_pm,
             |  CAST(score_pm * 1000 // max_pm AS BIGINT) AS accept_pm,
             |  CAST(CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4)) AS UBIGINT) % 1000 AS BIGINT) AS draw_pm
             |FROM sc$x, mx$x
             |WHERE CAST(CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4)) AS UBIGINT) % 1000 AS BIGINT)
             |      < CAST(score_pm * 1000 // max_pm AS BIGINT)""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"WITH $withs\nSELECT * FROM (\n$union\n) ORDER BY seedoff, doc_id"
      }),

    // CUR9 — UniMax budget allocation (Chung et al. 2023, "UniMax:
    // Fairer and More Effective Language Sampling for Large-Scale
    // Multilingual Pretraining"): split a total token budget (here 70%
    // of one corpus epoch) across sources, capping every source at 1
    // epoch of its own data — the published successor to cur7's
    // temperature rule that stops rare-source over-repetition. The
    // water-filling has a closed form over sources sorted by capacity:
    // k* = the longest ascending prefix whose members can be fully
    // capped within budget (lhs_i = P_i + (n-i)·c_i <= B), every later
    // source gets the integer water level θ = (B - P_k*) div (n - k*).
    // All window algebra on a SOURCE-cardinality frame (bounded — the
    // single-partition windows hold ~20 rows here, ~10^3 at worst in
    // production), so the corpus is touched exactly once by the token
    // aggregate. Products are (small count)×(sum) — bounded inside
    // int64, not the sum×sum overflow class.
    Q("cur9_unimax_alloc",
      (s, dir) => graft.operators.Mixing.unimaxAlloc(
        t(s, dir, "documents")
          .groupBy("source")
          .agg(sum(TextAnalysis.tokenCount(col("text"))).as("tok"))),
      Some(s"""WITH tok AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS tok
        |  FROM (SELECT source, CAST(CASE WHEN nrm = '' THEN 0
        |     ELSE length(nrm) - length(replace(nrm, ' ', '')) + 1 END AS BIGINT) AS nt
        |    FROM (SELECT source, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS nrm
        |      FROM documents)) GROUP BY 1),
        |b AS (SELECT source, tok,
        |  CAST(ROW_NUMBER() OVER (ORDER BY tok, source) AS BIGINT) AS i,
        |  CAST(SUM(tok) OVER (ORDER BY tok, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p,
        |  CAST(COUNT(*) OVER () AS BIGINT) AS n,
        |  CAST(SUM(tok) OVER () * 7 // 10 AS BIGINT) AS budget
        | FROM tok),
        |c AS (SELECT *, p + (n - i) * tok AS lhs FROM b),
        |d AS (SELECT *,
        |  COALESCE(MAX(CASE WHEN lhs <= budget THEN i END) OVER (), 0) AS k,
        |  COALESCE(MAX(CASE WHEN lhs <= budget THEN p END) OVER (), 0) AS pk
        | FROM c),
        |e AS (SELECT source, tok,
        |  CAST(CASE WHEN i <= k OR k >= n THEN tok
        |       ELSE LEAST(tok, (budget - pk) // (n - k)) END AS BIGINT) AS alloc
        | FROM d)
        |SELECT source, tok, alloc,
        |  CAST(CASE WHEN tok = 0 THEN 0 ELSE alloc * 1000 // tok END AS BIGINT) AS epochs_pm
        |FROM e
        |ORDER BY source NULLS FIRST""".stripMargin)),

    // FE6 — signed feature hashing (the hashing trick): project each
    // document's bag of words into 64 buckets, with a ±1 sign drawn from
    // an independent hash bit so collisions cancel in expectation
    // (Weinberger 2009 §3 — the sign is what makes the estimator
    // unbiased). Emitted for the deterministic 1-in-11 doc_id sample so
    // the output stays sample-grain while the transform itself is one
    // explode + one aggregate over the full corpus shape. Bucket and sign
    // both come from md5 nibbles, replayed exactly by the oracle.
    Q("fe6_feature_hash",
      (s, dir) => {
        t(s, dir, "documents")
          .filter(col("doc_id") % 11 === 0)
          .select(col("doc_id"), explode(Corpus.words(col("text"))).as("wd"))
          .select(col("doc_id"),
            expr("CAST(conv(substr(md5(wd),1,3),16,10) AS BIGINT) % 64").as("b"),
            expr("CASE WHEN CAST(conv(substr(md5(wd),4,1),16,10) AS BIGINT) % 2 = 0 " +
              "THEN 1 ELSE -1 END").as("sgn"))
          .groupBy("doc_id", "b")
          .agg(expr("CAST(sum(sgn) AS BIGINT)").as("val"))
          .filter(col("val") =!= 0)
          .orderBy(col("doc_id"), col("b"))
      },
      Some("""WITH ws AS (SELECT doc_id,
        |        string_split(trim(regexp_replace(text,'\s+',' ','g')),' ') AS w
        |        FROM documents WHERE doc_id % 11 = 0 AND trim(text) <> ''),
        |wx AS (SELECT doc_id, unnest(w) AS wd FROM ws),
        |h AS (SELECT doc_id,
        |        CAST(CAST(('0x'||substr(md5(wd),1,3)) AS UBIGINT) % 64 AS BIGINT) AS b,
        |        CASE WHEN CAST(('0x'||substr(md5(wd),4,1)) AS UBIGINT) % 2 = 0
        |             THEN 1 ELSE -1 END AS sgn
        |      FROM wx)
        |SELECT doc_id, b, CAST(sum(sgn) AS BIGINT) AS val
        |FROM h GROUP BY 1, 2
        |HAVING CAST(sum(sgn) AS BIGINT) <> 0
        |ORDER BY doc_id, b""".stripMargin)))
}
