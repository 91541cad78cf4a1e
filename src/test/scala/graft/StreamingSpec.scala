package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.streaming.EventStreams
import graft.sources.Tables

/** Structured Streaming parity: the streaming plans must produce the same
  * results as their batch equivalents when fed the same files.
  */
class StreamingSpec extends SparkSpec {

  test("file-source stream: hourly window agg matches batch") {
    val stream = EventStreams.readEventsStream(spark, sf)
    val q = EventStreams.startMemorySink(
      EventStreams.hourlyByType(stream, watermark = false), "hourly_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_test")
        .collect().map(_.toSeq).toSet
      val batch = EventStreams.hourlyByType(
        Tables.load(spark, sf, "events"), watermark = false)
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals match batch aggregate") {
    val stream = EventStreams.readEventsStream(spark, sf)
    val totals = EventStreams.runningUserTotals(spark, stream)
    val q = totals.toDF("user_id", "cnt", "total_c")
      .writeStream.format("memory").queryName("totals_test")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // last update per user == the full batch aggregate (single batch here)
      val streamed = spark.table("totals_test")
        .groupBy("user_id").agg(max("cnt").as("cnt"), max("total_c").as("total_c"))
        .collect().map(_.toSeq).toSet
      val batch = Tables.load(spark, sf, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * 100).cast(LongType)).as("total_c"))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
