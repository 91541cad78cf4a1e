package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.{AggSpec, JoinView}

/** Streaming RETRACTION-capable view maintenance — the standing form of
  * inc5, completing the maintenance family: [[ViewMaintenance]] takes
  * an append-only fact stream plus dim deltas, [[RetractionMaintenance]]
  * takes a signed changelog with no dimension; this handle consumes a
  * SIGNED fact changelog (`_sign` +1 insert / −1 retract; an update is
  * its −old/+new pair, arriving together or across triggers) AND
  * between-trigger dimension changelogs, maintaining
  * `agg(F ⋈ D) GROUP BY dim attrs` for invertible aggregates.
  *
  * State is the [[IncrementalAgg.JoinView]] triple with a
  * counting-algebra key-grain sub-aggregate (signed `_rows`
  * multiplicity + per-sum non-null witnesses): keys retracted to zero
  * rows vanish, a group whose last non-null measure is retracted
  * publishes SUM = NULL, and groups losing every key drop out of the
  * view — full-recompute parity after any trigger. Per-trigger work is
  * the trigger's own signed key-grain aggregate plus the affected-group
  * splice; stored facts are never rescanned. localCheckpoint per merge
  * keeps lineage flat across arbitrarily many triggers.
  *
  * Invariant (spec-gated): after any stream prefix, `view` equals the
  * batch [[IncrementalAgg.buildRetractableJoinView]] over the NET fact
  * multiset seen so far against the dimension as of now — however the
  * signed changelog was micro-batched and whenever the dim deltas were
  * interleaved, because the signed fold is associative/commutative and
  * the splice re-derives affected groups from the folded state.
  */
final class RetractableViewMaintenance(spark: SparkSession,
    dim0: DataFrame, joinKeys: Seq[String], groupCols: Seq[String],
    aggs: Seq[AggSpec], signCol: String = "_sign") extends BatchLedger {

  @volatile private var state: JoinView = null
  @volatile private var noDeltas: DataFrame = null

  /** The published view as of the last merged trigger (None before). */
  def view: Option[DataFrame] = Option(state).map(_.view)

  /** The counting key-grain state (inspection / persistence). */
  def keyAgg: Option[DataFrame] = Option(state).map(_.keyAgg)

  /** foreachBatch body — fold one trigger's SIGNED fact deltas. A
    * non-negative `batchId` rides the [[BatchLedger]]: a checkpoint-
    * replayed trigger is a no-op; −1 folds unconditionally.
    */
  def merge(signedDeltas: DataFrame, batchId: Long = -1L): Unit =
      synchronized {
    if (alreadyApplied(batchId)) return
    if (state == null) {
      noDeltas = signedDeltas.limit(0).localCheckpoint(eager = true)
      // an empty base: the first trigger IS the first delta batch
      state = checkpointed(IncrementalAgg.buildRetractableJoinView(
        signedDeltas.limit(0).drop(signCol), dim0, joinKeys, groupCols,
        aggs))
    }
    if (!signedDeltas.isEmpty) {
      state = checkpointed(IncrementalAgg.refreshRetractableJoinView(
        state, signedDeltas,
        state.dim.limit(0).withColumn("op", lit("U")),
        joinKeys, groupCols, aggs, signCol))
    }
    recordApplied(batchId)
  }

  /** Apply a dimension changelog (dim columns + `op`, at most one row
    * per key) between triggers — affected groups recompute from the
    * folded counting state, no fact rescan, no stream replay.
    */
  def applyDimDelta(changes: DataFrame): Unit = synchronized {
    require(state != null, "fold at least one trigger before dim deltas")
    state = checkpointed(IncrementalAgg.refreshRetractableJoinView(
      state, noDeltas, changes, joinKeys, groupCols, aggs, signCol))
  }

  private def checkpointed(jv: JoinView): JoinView =
    JoinView(jv.keyAgg.localCheckpoint(eager = true),
      jv.dim.localCheckpoint(eager = true),
      jv.view.localCheckpoint(eager = true))

  /** Persist the full maintenance state — the JoinView triple plus the
    * (empty) delta schema — so a restarted job
    * [[RetractableViewMaintenance.resume]]s mid-changelog with no
    * stored-fact rescan. Call between triggers.
    */
  def save(path: String): Unit = synchronized {
    require(state != null, "fold at least one trigger before saving")
    Snapshots.publish(spark, path) { dir =>
      state.keyAgg.write.mode("overwrite").parquet(s"$dir/keyAgg")
      state.dim.write.mode("overwrite").parquet(s"$dir/dim")
      state.view.write.mode("overwrite").parquet(s"$dir/view")
      noDeltas.write.mode("overwrite").parquet(s"$dir/deltaSchema")
      BatchLedger.save(spark, dir, lastAppliedBatch)
    }
  }

  /** Wire a streaming signed changelog into this handle. The trigger's
    * batchId rides the ledger, so a checkpoint-driven replay after
    * restart is a no-op.
    */
  def attach(signedDeltas: DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    signedDeltas.writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, id: Long) => merge(b, id) }
}

object RetractableViewMaintenance {

  /** Reconstruct a [[RetractableViewMaintenance.save]]d handle in a
    * fresh job: the counting key-grain state, the dimension as of the
    * kill, and the published view all load from parquet — the signed
    * changelog consumed before the kill is never replayed. Restart
    * parity at multiple kill points is the spec-gated invariant.
    */
  def resume(spark: SparkSession, path: String, joinKeys: Seq[String],
      groupCols: Seq[String], aggs: Seq[AggSpec],
      signCol: String = "_sign"): RetractableViewMaintenance = {
    val dir = Snapshots.resolve(spark, path)
    // eager localCheckpoints cut lineage to the snapshot files, so a
    // later save() to the SAME path is not an overwrite-what-you-read
    val dim = spark.read.parquet(s"$dir/dim").localCheckpoint(eager = true)
    val h = new RetractableViewMaintenance(spark, dim, joinKeys,
      groupCols, aggs, signCol)
    h.state = JoinView(
      spark.read.parquet(s"$dir/keyAgg").localCheckpoint(eager = true),
      dim,
      spark.read.parquet(s"$dir/view").localCheckpoint(eager = true))
    h.noDeltas = spark.read.parquet(s"$dir/deltaSchema")
      .localCheckpoint(eager = true)
    h.restoreLedger(BatchLedger.load(spark, dir))
    h
  }
}
