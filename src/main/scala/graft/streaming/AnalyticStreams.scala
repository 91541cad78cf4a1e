package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key CUSUM accumulator state (milli fixed point). */
case class CusumState(s: Long, mx: Long, alarms: Long)

/** One emitted CUSUM observation: the day's cumulative statistic and
  * whether it crosses the alarm threshold.
  */
case class CusumRow(key: String, epochDay: Long, cusumMilli: Long,
    alarmed: Boolean)

/** Streaming analytics over keyed day-grain series — the standing-
  * pipeline form of the an3 batch detector: a CONTINUOUS one-sided CUSUM
  * (Page 1954) that alarms in the micro-batch where the drift crosses
  * the threshold, instead of at the end of a batch scan.
  *
  * The reference level is a PARAMETER (`targetMilli`), as in any online
  * CUSUM — a batch pass knows the full-series mean, a stream does not;
  * deployments calibrate the target on a history window. Parity
  * (spec-gated): over any prefix of the day stream, the emitted
  * (cusum, alarm) sequence equals the batch recurrence folded over the
  * same days with the same target — however the stream is micro-batched.
  *
  * State per key is three longs — O(#keys) forever, the cheapest state
  * shape Structured Streaming has. Within a trigger, days fold in
  * day order (sorted intake, the DocStreams discipline); cross-trigger
  * late days are the source's watermark problem, as with any
  * append-mode aggregation.
  */
object AnalyticStreams {

  /** CUSUM over a streaming (key, epochDay, count) day-grain frame.
    * cusum_t = max(0, cusum_{t-1} + c_t·1000 − targetMilli − slackMilli);
    * a row alarms when cusum_t > thresholdMilli.
    */
  def cusum(spark: SparkSession, dayCounts: DataFrame,
      keyCol: String, dayCol: String, countCol: String,
      targetMilli: Long, slackMilli: Long,
      thresholdMilli: Long): Dataset[CusumRow] = {
    import spark.implicits._
    dayCounts
      .select(col(keyCol).cast("string").as("key"),
        col(dayCol).cast("long").as("epochDay"),
        col(countCol).cast("long").as("c"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, CusumRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (key, rows, state: GroupState[CusumState]) =>
          var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L))
          val out = Seq.newBuilder[CusumRow]
          rows.toArray.sortBy(_._2).foreach { case (_, day, c) =>
            val s2 = math.max(0L, st.s + c * 1000L - targetMilli - slackMilli)
            val alarmed = s2 > thresholdMilli
            st = CusumState(s2, math.max(st.mx, s2),
              st.alarms + (if (alarmed) 1L else 0L))
            out += CusumRow(key, day, s2, alarmed)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
