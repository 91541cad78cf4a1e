package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequential funnel analysis over an event log: for an ordered list of
  * stage event types, compute per user the first time each stage was
  * reached STRICTLY AFTER the previous stage (the standard product-
  * analytics funnel; each stage's timestamp is the earliest qualifying
  * event, so the result is deterministic and SQL-replayable with chained
  * `MIN(ts) WHERE ts > prev` CTEs).
  *
  * Scale shape: stage k is one equi-join of the (filtered, 3-column)
  * event projection against the per-user stage-(k-1) frame followed by a
  * per-user MIN — the stage frames are bounded by the user count, so
  * AQE broadcasts them once users ≪ events and every pass over the fact
  * table is a pushed-filter scan (`event_type = stage`) that never
  * shuffles raw events: only the matched (user, ts) rows enter the
  * aggregate, and partial MIN combines map-side. N stages = N scans of a
  * 3-column pruned projection, not N shuffles of the log.
  */
object Funnel {

  /** Per-user funnel frame: `(user, stage_reached, t_first, t_last)` where
    * `stage_reached` ∈ [1, stages.length] counts completed stages,
    * `t_first` is the stage-1 timestamp and `t_last` the timestamp of the
    * deepest stage reached (= t_first when only stage 1 matched). Users
    * with no stage-1 event (or a NULL user key) are absent.
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val ev = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol), col(typeCol), col(tsCol))

    def stageTs(i: Int): String = s"t$i"

    val first = ev.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as(stageTs(1)))

    val frames = stages.zipWithIndex.tail.scanLeft(first) {
      case (prev, (stage, i)) =>
        ev.filter(col(typeCol) === stage)
          .join(prev, Seq(userCol))
          .filter(col(tsCol) > col(stageTs(i)))
          .groupBy(col(userCol))
          .agg(min(col(tsCol)).as(stageTs(i + 1)))
    }

    val joined = frames.zipWithIndex.tail.foldLeft(frames.head) {
      case (acc, (f, _)) => acc.join(f, Seq(userCol), "left")
    }
    val reached = frames.indices.tail
      .map(i => when(col(stageTs(i + 1)).isNotNull, 1).otherwise(0))
      .foldLeft(lit(1): Column)(_ + _)
    val tLast = coalesce(
      (frames.indices.reverse.map(i => col(stageTs(i + 1)))): _*)
    joined.select(col(userCol),
      reached.cast(LongType).as("stage_reached"),
      col(stageTs(1)).as("t_first"),
      tLast.as("t_last"))
  }
}
