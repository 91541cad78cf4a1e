package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Funnel
import graft.sources.Tables
import graft.streaming.{EventStreams, FunnelStream}

/** Streaming funnel: incremental fold under micro-batched, watermarked
  * arrival must equal the batch funnel on the same events.
  */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private val stages = Seq("signup", "view", "click", "purchase")

  test("fold: strict ordering, gap discard, equal-ts order independence") {
    // commits stage 0 at 10, stage 1 at 20; the ts=20 stage-2 event can't
    // commit (needs > 20); the later one can
    assert(FunnelStream.fold(Nil,
      Seq((10L, 0), (20L, 1), (20L, 2), (30L, 2))) === List(10L, 20L, 30L))
    // stage-1 event before any stage-0 commit is discarded forever
    assert(FunnelStream.fold(Nil, Seq((5L, 1), (10L, 0))) === List(10L))
    // equal-ts pair: either processing order yields the same commit set
    assert(FunnelStream.fold(Nil, Seq((10L, 0), (10L, 1))) === List(10L))
    assert(FunnelStream.fold(Nil, Seq((10L, 1), (10L, 0))) === List(10L))
    // incremental: folding in two calls == folding once
    val once = FunnelStream.fold(Nil, Seq((10L, 0), (15L, 1), (30L, 2)))
    val twice = FunnelStream.fold(
      FunnelStream.fold(Nil, Seq((10L, 0), (15L, 1))), Seq((30L, 2)))
    assert(once === twice)
  }

  test("streaming funnel == batch on a tie-heavy fuzz frame arriving in " +
      "RANDOM order across micro-batches (horizon covers the disorder)") {
    import java.nio.file.Files
    import graft.testgen.RandFrame
    import graft.testgen.RandFrame._
    val work = Files.createTempDirectory("graft_funnel_fuzz").toString
    val srcDir = s"$work/src"
    new java.io.File(srcDir).mkdirs()

    // day-granularity timestamps over 10 users: heavy equal-ts collisions
    val ev = RandFrame.df(spark, 400, 27001L,
        ColSpec("u", CInt, 30), ColSpec("k", CInt, 0), ColSpec("t", CDateTime, 0))
      .withColumn("event_type", element_at(
        array(lit("signup"), lit("view"), lit("click"), lit("purchase")),
        (col("k") % 4 + 1).cast("int")))
      .select(col("u").as("user_id"), col("event_type"), col("t").as("ts"))
      .withColumn("part", pmod(hash(col("user_id"), col("ts"), col("event_type")), lit(3)))
      .cache()
    // arrival order decorrelated from event time: three hash batches
    for (p <- 0 until 3)
      ev.filter(col("part") === p).drop("part")
        .write.mode("append").parquet(srcDir)
    val schema = ev.drop("part").schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val q = FunnelStream.funnelStream(spark, stream, stages, horizon = "30 days")
      .toDF().writeStream.format("memory").queryName("funnel_fuzz_test")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // flush sentinel: one event far beyond every real ts + horizon
      Seq((-1L, "signup", java.time.LocalDateTime.of(2021, 1, 1, 0, 0)))
        .toDF("user_id", "event_type", "ts")
        .select(col("user_id"), col("event_type"),
          col("ts").cast("timestamp_ntz").as("ts"))
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()

      val streamed = spark.table("funnel_fuzz_test")
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(max(struct(col("stage_reached"), col("t_first_us"),
          col("t_last_us"))).as("s"))
        .select(col("user_id"), col("s.stage_reached"),
          col("s.t_first_us"), col("s.t_last_us"))
        .collect().map(_.toSeq).toSet

      val batch = Funnel.funnel(ev.drop("part"),
          "user_id", "event_type", "ts", stages)
        .select(col("user_id"), col("stage_reached"),
          unix_micros(col("t_first").cast(TimestampType)).as("t_first_us"),
          unix_micros(col("t_last").cast(TimestampType)).as("t_last_us"))
        .collect().map(_.toSeq).toSet

      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming funnel == batch funnel across time-split micro-batches " +
      "with a 1h watermark horizon") {
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft_funnel").toString
    val srcDir = s"$work/src"
    new java.io.File(srcDir).mkdirs()

    val raw = EventStreams.eventsAsRawNanos(spark, sf)
    val medianNs = raw.stat.approxQuantile("ts", Array(0.5), 0.0).head.toLong
    val maxNs = raw.agg(max("ts")).head().getLong(0)
    // batch 1: the earlier half by event time
    raw.filter(col("ts") <= medianNs).write.mode("overwrite").parquet(srcDir)

    val stream = spark.readStream.schema(EventStreams.rawSchema).parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    val q = FunnelStream.funnelStream(spark, stream, stages, horizon = "1 hour")
      .toDF().writeStream.format("memory").queryName("funnel_test")
      .outputMode("update").start()
    try {
      q.processAllAvailable()
      // batch 2: the later half — all newer than the current watermark
      raw.filter(col("ts") > medianNs).write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      // flush sentinel 10 days out (user -1, filtered from the compare)
      spark.range(1).selectExpr("999999 AS event_id",
        s"${maxNs + 10L * 86400 * 1000000000L} AS ts",
        "CAST(-1 AS LONG) AS user_id", "'signup' AS event_type",
        "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()

      // latest update per user (stage_reached is monotone per user)
      val streamed = spark.table("funnel_test")
        .filter(col("user_id") >= 0)
        .groupBy("user_id")
        .agg(max(struct(col("stage_reached"), col("t_first_us"),
          col("t_last_us"))).as("s"))
        .select(col("user_id"), col("s.stage_reached"),
          col("s.t_first_us"), col("s.t_last_us"))
        .collect().map(_.toSeq).toSet

      val batch = Funnel.funnel(Tables.load(spark, sf, "events"),
          "user_id", "event_type", "ts", stages)
        .select(col("user_id"), col("stage_reached"),
          unix_micros(col("t_first").cast(TimestampType)).as("t_first_us"),
          unix_micros(col("t_last").cast(TimestampType)).as("t_last_us"))
        .collect().map(_.toSeq).toSet

      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }
}
