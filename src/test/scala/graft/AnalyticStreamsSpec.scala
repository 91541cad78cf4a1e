package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.AnalyticStreams

/** Streaming CUSUM parity: the emitted (cusum, alarm) sequence over a
  * day stream must equal the batch recurrence folded over the same days
  * with the same target, however the stream is micro-batched — and the
  * planted level shift must raise the alarm mid-stream.
  */
class AnalyticStreamsSpec extends SparkSpec {
  import spark.implicits._

  // per-type day-grain counts with a 2x level shift from Jan 16 on
  // (an3's shifted arm), as (type, epochDay, count) in day order
  private lazy val days: Seq[(String, Long, Long)] =
    Tables.load(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("c"))
      .select(col("event_type"), unix_date(col("d")).cast("long").as("ed"),
        when(col("d") >= lit("2024-01-16"), col("c") * 2)
          .otherwise(col("c")).as("c"))
      .as[(String, Long, Long)]
      .collect().toSeq.sortBy(r => (r._2, r._1))

  private lazy val target: Long = {
    val byType = days.groupBy(_._1)
    // one shared reference level: mean of the raw-ish series (the
    // calibration a deployment would do); exact integer milli
    val all = days.map(_._3)
    all.sum * 1000L / all.size
  }

  private def expected(slack: Long, h: Long): Seq[(String, Long, Long, Boolean)] = {
    days.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      var s = 0L
      rows.sortBy(_._2).map { case (_, day, c) =>
        s = math.max(0L, s + c * 1000L - target - slack)
        (k, day, s, s > h)
      }
    }.sortBy(r => (r._1, r._2))
  }

  private def run(parts: Int): Seq[(String, Long, Long, Boolean)] = {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long, Long)]
    val q = AnalyticStreams.cusum(spark,
        ms.toDF().toDF("event_type", "ed", "c"),
        "event_type", "ed", "c",
        targetMilli = target, slackMilli = target / 10,
        thresholdMilli = target)
      .writeStream.format("memory").queryName(s"cusum_$parts")
      .outputMode("append").start()
    try {
      days.grouped(math.max(1, days.size / parts)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      spark.table(s"cusum_$parts")
        .as[(String, Long, Long, Boolean)]
        .collect().toSeq.sortBy(r => (r._1, r._2))
    } finally q.stop()
  }

  test("streamed CUSUM == batch recurrence, 4 micro-batches") {
    val got = run(4)
    val want = expected(target / 10, target)
    assert(got === want)
    assert(got.exists(_._4), "planted shift must raise the alarm")
    assert(got.exists(!_._4), "pre-shift days must stay quiet")
  }

  test("micro-batching invariant: 1 batch == 6 batches") {
    assert(run(1) === run(6))
  }
}
