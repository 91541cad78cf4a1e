package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Streaming funnel analysis — the standing-pipeline form of
  * [[graft.operators.Funnel]]: per-user sequential stage detection
  * (stage k counts only strictly after stage k-1) that stays correct
  * under OUT-OF-ORDER arrival. Events buffer in per-user state until the
  * watermark passes them, then fold in event-time order into the stage
  * machine; a buffered event is folded only once no earlier event can
  * still arrive, so the incremental result equals the batch funnel on
  * the same data regardless of micro-batching.
  *
  * State is bounded: committed stage times (≤ |stages| longs) plus the
  * events still inside the watermark horizon (arrival rate × horizon) —
  * never stream length. The fold is order-independent for equal
  * timestamps (strict `>` means at most one of two equal-ts events can
  * ever commit, whichever folds first), which is exactly the slack the
  * watermark contract leaves (late rows at ts == watermark survive).
  */
object FunnelStream {

  /** committed = stage times so far (epoch micros, index = stage);
    * buffer = (ts micros, stage index) events not yet past the watermark
    */
  final case class FunnelState(committed: List[Long], buffer: List[(Long, Int)])

  final case class FunnelRow(user_id: Long, stage_reached: Long,
      t_first_us: Long, t_last_us: Long)

  /** Fold ripe events (ascending event time; ties by stage index) into
    * the committed-stage prefix. Pure — unit-testable outside streaming.
    */
  private[graft] def fold(committed0: List[Long],
      ripe: Seq[(Long, Int)]): List[Long] = {
    var committed = committed0
    ripe.sorted.foreach { case (tsu, si) =>
      if (si == committed.length &&
        (si == 0 || tsu > committed.last)) committed = committed :+ tsu
    }
    committed
  }

  /** Streaming funnel over a canonical event stream (`user_id`,
    * `event_type`, `ts`). Update-mode output: the latest row per user is
    * the funnel state after every event at or before the watermark.
    */
  def funnelStream(spark: SparkSession, events: DataFrame,
      stages: Seq[String], horizon: String = "1 hour"): Dataset[FunnelRow] = {
    import spark.implicits._
    val stageIdx = stages.zipWithIndex.toMap
    val typed = events
      .filter(col("event_type").isin(stages.map(x => x: Any): _*) &&
        col("user_id").isNotNull)
      .withColumn("tsx", col("ts").cast(TimestampType))
      .withWatermark("tsx", horizon)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("tsx")).as("ts_us"),
        col("tsx")) // watermark column must survive to the stateful op
      .as[(Long, String, Long, java.sql.Timestamp)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, FunnelRow](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (user, rows, state) =>
          val st0 = state.getOption.getOrElse(FunnelState(Nil, Nil))
          val incoming = rows.map(r => (r._3, stageIdx(r._2))).toList
          // fold everything the watermark has passed; keep the rest
          val wmMs = state.getCurrentWatermarkMs()
          val wmUs = wmMs * 1000L
          val (ripe, keep) = (st0.buffer ++ incoming).partition(_._1 <= wmUs)
          val committed = fold(st0.committed, ripe)
          state.update(FunnelState(committed, keep))
          // without this, a key with buffered events but no further
          // arrivals is never re-invoked and its buffer never folds: an
          // event-time timeout at the earliest buffered event makes the
          // watermark advance itself trigger the next fold
          if (keep.nonEmpty)
            state.setTimeoutTimestamp(math.max(wmMs + 1, keep.map(_._1).min / 1000L))
          if (committed.isEmpty) Iterator.empty
          else Iterator.single(FunnelRow(user, committed.length.toLong,
            committed.head, committed.last))
      }
  }
}
