package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DSIR importance-selection kernel (Xie et al. 2023, "Data
  * Selection for Language Models via Importance Resampling"), shared by
  * the batch queries (imp1-imp5 in [[graft.queries.SelectionOps]]) and
  * the streaming handle ([[graft.streaming.SelectionMaintenance]]).
  *
  * Feature space: hashed bigram buckets (constant `Buckets`-grain), so
  * the sufficient statistics for the whole importance model are one
  * 256-row (bucket, target-count, raw-count) table — the property that
  * makes the model maintainable incrementally with O(1) state and lets
  * the ratio table broadcast into doc-grain scoring at any corpus size.
  * All arithmetic is integer fixed-point over md5-derived buckets so a
  * DuckDB oracle replays every step bit-for-bit (permille ratios with
  * truncating division; the cross-sum products run in Decimal(38,0) per
  * the silent-int64-wrap convention).
  *
  * Ref: the reference (slide/utils.py) has no selection surface; the
  * recipe is the public DSIR paper's.
  */
object DsirSelection {

  /** Constant feature-space grain — 4 md5 hex chars mod 256. */
  val Buckets = 256

  /** Target-domain source label: documents of this source fit the
    * target bag-of-ngrams model; everything else is the raw pool.
    */
  val TargetSource = "src0"

  /** Per-(doc, source, hashed-bigram-bucket) counts: one explode + one
    * aggregate over `docs(doc_id, source, text)`.
    */
  def hashedBigramCounts(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("source"),
        explode(Corpus.shingles(col("text"), 2)).as("g"))
      .select(col("doc_id"), col("source"),
        expr(s"CAST(conv(substr(md5(g),1,4),16,10) AS BIGINT) % $Buckets").as("b"))
      .groupBy("doc_id", "source", "b")
      .agg(count(lit(1)).as("cnt"))

  /** The model's sufficient statistics: (b, tc, rc) — target and raw
    * bucket totals, zero-filled. At most `Buckets` rows regardless of
    * corpus size; two such tables merge by addition (the streaming
    * maintenance invariant).
    */
  def bucketState(fb: DataFrame): DataFrame =
    fb.groupBy("b").agg(
      sum(when(col("source") === TargetSource, col("cnt")).otherwise(0L)).as("tc"),
      sum(when(col("source") =!= TargetSource, col("cnt")).otherwise(0L)).as("rc"))

  /** Add two bucket states (either may be missing buckets). */
  def mergeState(a: DataFrame, delta: DataFrame): DataFrame = {
    val l = a.select(col("b"), col("tc").as("tc_a"), col("rc").as("rc_a"))
    val r = delta.select(col("b"), col("tc").as("tc_d"), col("rc").as("rc_d"))
    l.join(r, Seq("b"), "fullouter")
      .select(col("b"),
        (coalesce(col("tc_a"), lit(0L)) + coalesce(col("tc_d"), lit(0L))).as("tc"),
        (coalesce(col("rc_a"), lit(0L)) + coalesce(col("rc_d"), lit(0L))).as("rc"))
  }

  /** Per-bucket smoothed probability ratio in permille,
    * r(b) = ((tc+1) * raw_tot * 1000) div ((rc+1) * tgt_tot), over the
    * buckets the raw pool populates — the DSIR log-likelihood-ratio
    * proxy kept in exact integer arithmetic. Bounded frames (<= Buckets
    * rows x 1-row totals): safe to hint broadcast downstream.
    */
  def ratioTable(state: DataFrame): DataFrame = {
    val tots = state.agg(sum(col("tc")).as("tgt_tot"), sum(col("rc")).as("raw_tot"))
    state.filter(col("rc") > 0)
      .crossJoin(broadcast(tots))
      .select(col("b"),
        expr("CAST((CAST(tc + 1 AS DECIMAL(38,0)) * raw_tot * 1000) div " +
          "(CAST(rc + 1 AS DECIMAL(38,0)) * tgt_tot) AS BIGINT)").as("r_pm"))
  }

  /** (doc_id, score_pm) for every raw-pool document in `fb`: the
    * count-weighted mean of the bucket ratios — one broadcast join +
    * one doc-grain aggregate.
    */
  def scoreDocs(fb: DataFrame, r: DataFrame): DataFrame =
    fb.filter(col("source") =!= TargetSource)
      .join(broadcast(r), Seq("b"))
      .groupBy("doc_id")
      .agg(expr("CAST(sum(cnt * r_pm) div sum(cnt) AS BIGINT)").as("score_pm"))

  /** Deterministic importance RESAMPLE: keep a doc iff its
    * content-independent md5 permille draw falls below score_pm scaled
    * to [0,1000] by the global max — Bernoulli thinning with acceptance
    * probability proportional to the importance weight, reproducible at
    * any parallelism. Adds accept_pm / draw_pm columns.
    */
  def resample(scored: DataFrame): DataFrame = {
    val mx = scored.agg(max(col("score_pm")).as("max_pm"))
    // greatest(max_pm, 1) guards the degenerate all-zero-score corpus:
    // without it the division is null in non-ANSI Spark (silently
    // selecting nothing) while DuckDB's // diverges. With the guard the
    // semantics are DEFINED and engine-identical: max_pm <= 0 means
    // every accept_pm <= 0, so the resample selects nothing, loudly
    // visible in the emitted accept_pm column rather than via nulls.
    scored.crossJoin(broadcast(mx))
      .withColumn("accept_pm",
        expr("CAST(score_pm * 1000 div greatest(max_pm, 1) AS BIGINT)"))
      .withColumn("draw_pm",
        expr("CAST(conv(substr(md5(CAST(doc_id AS STRING)),1,4),16,10) AS BIGINT) % 1000"))
      .filter(col("draw_pm") < col("accept_pm"))
  }
}
