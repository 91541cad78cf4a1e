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

  test("watermarked append-mode parquet sink finalizes windows across batches") {
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft_stream").toString
    val srcDir = s"$work/src"
    val outDir = s"$work/out"
    val ckpt = s"$work/ckpt"
    new java.io.File(srcDir).mkdirs()
    // batch 1: the real events file (ts as raw nanos longs)
    val raw = EventStreams.eventsAsRawNanos(spark, sf)
    raw.write.mode("overwrite").parquet(srcDir)
    val maxNs = raw.agg(max("ts")).head().getLong(0)

    val stream = spark.readStream.schema(EventStreams.rawSchema).parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    val agg = EventStreams.hourlyByType(stream, watermark = true)
    val q = agg.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable() // batch 1: watermark still at epoch → no output
      // batch 2: one event 10 days later pushes the watermark past every
      // batch-1 window, finalizing them into the sink
      spark.range(1).selectExpr(
        "999999 AS event_id", s"${maxNs + 10L * 86400 * 1000000000L} AS ts",
        "CAST(1 AS LONG) AS user_id", "'click' AS event_type",
        "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val emitted = spark.read.parquet(outDir)
      val batchEquiv = EventStreams.hourlyByType(
        Tables.load(spark, sf, "events"), watermark = false)
      // every batch-1 window must be emitted exactly once with the same agg
      assert(emitted.count() === batchEquiv.count())
      assert(emitted.collect().map(_.toSeq).toSet ===
        batchEquiv.collect().map(_.toSeq).toSet)
    } finally q.stop()
  }

  test("chained stateful ops: windowed dedup -> distinct count matches batch") {
    // hourlyUniques chains two stateful operators (dedup, then windowed
    // agg) — the streaming run must equal the batch plan AND the
    // registered st8 oracle shape
    val stream = EventStreams.readEventsStream(spark, sf)
    val q = EventStreams.startMemorySink(
      EventStreams.hourlyUniques(stream, watermark = false), "uniq_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("uniq_test").collect().map(_.toSeq).toSet
      val batch = EventStreams.hourlyUniques(
        Tables.load(spark, sf, "events"), watermark = false)
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
      // cross-check against plain COUNT(DISTINCT) semantics
      val direct = Tables.load(spark, sf, "events")
        .filter(col("user_id").isNotNull)
        .groupBy(date_trunc("hour", col("ts")).cast("timestamp").as("hour"))
        .agg(countDistinct(col("user_id")).as("uniques"))
        .collect().map(_.toSeq).toSet
      assert(batch.map(r => Seq(r.head, r(1))) === direct)
    } finally q.stop()
  }

  test("stream-static join composed with windowed aggregate matches batch (st9)") {
    // the row-level enrichment test above proves the join; this proves
    // it COMPOSES with downstream stateful aggregation — the streaming
    // run must equal st9's registered batch twin on the same inputs
    val stream = EventStreams.readEventsStream(spark, sf)
    val dim = Tables.load(spark, sf, "customer")
    val q = EventStreams.startMemorySink(
      EventStreams.hourlyBySegment(stream, dim, watermark = false), "seg_test")
    try {
      q.processAllAvailable()
      val streamed = spark.table("seg_test").collect().map(_.toSeq).toSet
      val batch = EventStreams.hourlyBySegment(
        Tables.load(spark, sf, "events"), dim, watermark = false)
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("session windows: streaming sessions finalize at the watermark and match batch (st10)") {
    // session_window state MERGES adjacent windows per key (unlike
    // tumbling/sliding, a window's extent depends on the data), so the
    // parity worth proving is the watermarked append path: sessions are
    // emitted exactly once, closed, and equal to the batch twin. A
    // sentinel event 10 days out pushes the watermark past every real
    // session; the sentinel's own still-open session stays in state.
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft_sessions").toString
    val srcDir = s"$work/src"
    new java.io.File(srcDir).mkdirs()
    val raw = EventStreams.eventsAsRawNanos(spark, sf)
    raw.write.mode("overwrite").parquet(srcDir)
    val maxNs = raw.agg(max("ts")).head().getLong(0)

    val stream = spark.readStream.schema(EventStreams.rawSchema).parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz"))
    val q = EventStreams.userSessions(stream).writeStream.format("parquet")
      .option("path", s"$work/out").option("checkpointLocation", s"$work/ckpt")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      spark.range(1).selectExpr(
        "999999 AS event_id", s"${maxNs + 10L * 86400 * 1000000000L} AS ts",
        "CAST(1 AS LONG) AS user_id", "'click' AS event_type",
        "CAST(1.0 AS DOUBLE) AS value", "'{}' AS props")
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val emitted = spark.read.parquet(s"$work/out").collect().map(_.toSeq).toSet
      val batch = EventStreams.userSessions(
        Tables.load(spark, sf, "events"), watermark = false)
        .collect().map(_.toSeq).toSet
      assert(emitted === batch)
      assert(emitted.nonEmpty)
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

  test("streaming dedup drops re-delivered events (batch parity)") {
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft_dedup").toString
    val srcDir = s"$work/src"
    new java.io.File(srcDir).mkdirs()
    val raw = EventStreams.eventsAsRawNanos(spark, sf)
    // simulate at-least-once delivery: the same events arrive twice
    raw.write.mode("append").parquet(srcDir)
    raw.write.mode("append").parquet(srcDir)
    val stream = spark.readStream.schema(EventStreams.rawSchema).parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = EventStreams.dedupStream(stream, Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_test")
      assert(got.count() === raw.count()) // every event exactly once
      assert(got.select("event_id").distinct().count() === raw.count())
      // the state store must be bounded: at most one row per distinct
      // key seen inside the watermark horizon — never per delivery
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows <= raw.count(),
        s"dedup state grew past distinct keys: $stateRows")
      assert(stateRows > 0)
    } finally q.stop()
  }

  test("windowed-agg state plateaus under sustained input (watermark evicts)") {
    // 5 file batches, each advancing event time by 24 hours. If the
    // watermark evicts finalized windows, state-store rows stay a small
    // constant (windows within ~the horizon); if it doesn't, state
    // accumulates one row per window ever seen (120 by the end).
    import java.nio.file.Files
    import spark.implicits._
    val work = Files.createTempDirectory("graft_evict").toString
    val srcDir = s"$work/src"
    new java.io.File(srcDir).mkdirs()
    val stream = spark.readStream.schema(EventStreams.rawSchema).parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = EventStreams.hourlyByType(stream)
      .writeStream.format("memory").queryName("evict_test")
      .outputMode("append").start()
    try {
      val baseNs = 1600000000L * 1000000000L
      val stateSizes = (0 until 5).map { b =>
        val rows = for (h <- 0 until 24; i <- 0 until 2) yield (
          b * 48L + h * 2L + i,
          baseNs + ((b * 24L + h) * 3600L + i * 60L) * 1000000000L,
          1L, "click", 1.0, "")
        rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("append").parquet(srcDir)
        q.processAllAvailable()
        q.lastProgress.stateOperators.head.numRowsTotal
      }
      // plateau, not growth: the last batch holds no more state than the
      // first (+slack for the watermark's one-trigger lag), and no point
      // in time ever held anything near the 120 windows seen overall
      assert(stateSizes.last <= stateSizes.head + 4, s"state grew: $stateSizes")
      assert(stateSizes.max <= 10, s"state not bounded by horizon: $stateSizes")
      // eviction IS emission in append mode: all but the last hours left
      val emitted = spark.table("evict_test").count()
      assert(emitted >= 110, s"only $emitted windows finalized")
    } finally q.stop()
  }

  test("stream-stream interval join matches its batch form") {
    val stream = EventStreams.readEventsStream(spark, sf)
    val q = EventStreams.viewToPurchase(stream)
      .writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_test")
        .select("user_id", "view_id", "purchase_id")
        .collect().map(_.toSeq).toSet
      val base = Tables.load(spark, sf, "events")
      val views = base.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
          col("event_id").as("view_id"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"))
      val batch = views.join(purchases,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
        .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("LEFT-OUTER stream-stream join: NULL rows appear once the watermark closes the window") {
    // the outer join's null side is watermark-gated: an unmatched view is
    // emitted only when no purchase can still arrive (wm > v_ts + 1h).
    // A finite stream therefore needs a flush batch past every deadline —
    // one far-future view AND purchase (both sides' watermarks must move)
    // for sentinel users that join nothing.
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft_outerjoin").toString
    val srcDir = s"$work/src"
    new java.io.File(srcDir).mkdirs()
    val raw = EventStreams.eventsAsRawNanos(spark, sf)
    raw.write.mode("overwrite").parquet(srcDir)
    val maxNs = raw.agg(max("ts")).head().getLong(0)
    val stream = spark.readStream.schema(EventStreams.rawSchema).parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = EventStreams.viewToPurchaseOuter(stream)
      .writeStream.format("memory").queryName("outer_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val farNs = maxNs + 10L * 86400 * 1000000000L
      for ((id, user, tpe) <- Seq((999998L, -1L, "view"), (999999L, -2L, "purchase")))
        spark.range(1).selectExpr(
          s"$id AS event_id", s"$farNs AS ts", s"CAST($user AS LONG) AS user_id",
          s"'$tpe' AS event_type", "CAST(0.0 AS DOUBLE) AS value", "'{}' AS props")
          .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      val streamed = spark.table("outer_test")
        .filter(col("user_id") >= 0) // drop the flush sentinels
        .select("user_id", "view_id", "purchase_id")
        .collect().map(_.toSeq).toSet
      val base = Tables.load(spark, sf, "events")
      val views = base.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
          col("event_id").as("view_id"))
      val purchases = base.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
          col("event_id").as("purchase_id"))
      val batch = views.join(purchases,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"),
        "left_outer")
        .select(col("v_user").as("user_id"), col("view_id"), col("purchase_id"))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch,
        "outer stream-stream join diverged from its batch form")
      assert(streamed.exists(_(2) == null), "no abandonment (NULL) rows emitted")
      assert(streamed.exists(_(2) != null), "no matched rows emitted")
    } finally q.stop()
  }

  test("idempotent sink: a replayed micro-batch does not duplicate output") {
    // foreachBatch is at-least-once: a crash between the batch write and
    // the checkpoint commit replays the batch on restart. The sink's
    // contract is that the replay must be invisible — batch i overwrites
    // its own batch_id=i partition instead of appending a second copy.
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft_idem").toString
    val srcDir = s"$work/src"
    val outDir = s"$work/out"
    new java.io.File(srcDir).mkdirs()
    val raw = EventStreams.eventsAsRawNanos(spark, sf)
    raw.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(EventStreams.rawSchema).parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
    val q = EventStreams.startIdempotentSink(stream, outDir, s"$work/ckpt")
    try q.processAllAvailable() finally q.stop()
    val once = spark.read.parquet(outDir)
    val onceCount = once.count()
    val expected = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
      .collect().map(_.toSeq).toSet
    assert(once.select("event_id", "user_id", "value")
      .collect().map(_.toSeq).toSet === expected)
    val batchIds = once.select(col("batch_id").cast(LongType)).distinct()
      .collect().map(_.getLong(0)).sorted
    // replay the LAST batch through the same writer fn (the crash-retry
    // path) — a real retry re-reads the SOURCE, so materialize the rows
    // before handing them to the writer that overwrites the sink
    val lastBatch = spark.read.parquet(outDir)
      .filter(col("batch_id") === batchIds.last)
      .drop("batch_id")
    val replayRows = spark.createDataFrame(
      new java.util.ArrayList(java.util.Arrays.asList(lastBatch.collect(): _*)),
      lastBatch.schema)
    EventStreams.idempotentBatchWriter(outDir)(replayRows, batchIds.last)
    spark.catalog.refreshByPath(outDir) // drop the cached file listing
    val twice = spark.read.parquet(outDir)
    assert(twice.count() === onceCount,
      "replayed batch appended duplicates instead of overwriting itself")
    assert(twice.select("event_id", "user_id", "value")
      .collect().map(_.toSeq).toSet === expected)
  }

  test("stream-stream join state is evicted at the watermark (bounded)") {
    // 5 file batches, each advancing event time by 24 hours, each with 20
    // (view, purchase-10-min-later) pairs. The interval bound + watermark
    // makes join state evictable: a view is dead once the watermark passes
    // v_ts + 1h, a purchase once it passes p_ts. If eviction works, state
    // plateaus at ~one batch's rows; if not, it grows to all 200 rows.
    import java.nio.file.Files
    import spark.implicits._
    val work = Files.createTempDirectory("graft_joinevict").toString
    val srcDir = s"$work/src"
    new java.io.File(srcDir).mkdirs()
    val stream = spark.readStream.schema(EventStreams.rawSchema).parquet(srcDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val q = EventStreams.viewToPurchase(stream)
      .writeStream.format("memory").queryName("joinevict_test")
      .outputMode("append").start()
    try {
      val baseNs = 1600000000L * 1000000000L
      val stateSizes = (0 until 5).map { b =>
        val rows = (0 until 20).flatMap { u =>
          val t0 = baseNs + (b * 24L * 3600L + u * 60L) * 1000000000L
          Seq((b * 100L + u * 2L, t0, u.toLong, "view", 0.0, ""),
            (b * 100L + u * 2L + 1L, t0 + 600L * 1000000000L,
              u.toLong, "purchase", 5.0, ""))
        }
        rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .write.mode("append").parquet(srcDir)
        q.processAllAvailable()
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      }
      // every in-window pair joined exactly once (inner join emits eagerly)
      assert(spark.table("joinevict_test").count() === 100L)
      // plateau, not growth: last batch holds no more than the first
      // (+slack for the watermark's one-trigger lag), and no point in
      // time ever held anything near the 200 rows seen overall
      assert(stateSizes.last <= stateSizes.head + 8, s"join state grew: $stateSizes")
      assert(stateSizes.max <= 100, s"join state not bounded: $stateSizes")
    } finally q.stop()
  }

  test("RocksDB state store: same results, state still bounded") {
    // the production state backend (spark.sql.streaming.stateStore
    // .providerClass): at 100 TB the state of a streaming agg/join/dedup
    // lives off-heap in RocksDB per partition, not on the JVM heap. The
    // pipeline must be provider-agnostic — same results, same eviction
    // bound, only the storage engine changes.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = EventStreams.readEventsStream(spark, sf)
      val q = EventStreams.startMemorySink(
        EventStreams.hourlyByType(stream, watermark = false), "rocksdb_test")
      try {
        q.processAllAvailable()
        val streamed = spark.table("rocksdb_test").collect().map(_.toSeq).toSet
        val batch = EventStreams.hourlyByType(
          Tables.load(spark, sf, "events"), watermark = false)
          .collect().map(_.toSeq).toSet
        assert(streamed === batch)
        assert(q.lastProgress.stateOperators.head.numRowsTotal > 0)
      } finally q.stop()
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-static enrichment join matches batch (dim side broadcast)") {
    // the standing-pipeline form of dimension enrichment: a static dim
    // table joined to every micro-batch. No state store involved — the
    // static side is planned per batch, so it broadcasts like any small
    // dim and the stream stays append-mode.
    val dim = Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val stream = EventStreams.readEventsStream(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        round(col("value") * 100).cast(LongType).as("v_c"))
    val q = stream.join(broadcast(dim), stream("user_id") === dim("c_custkey"))
      .select(col("event_id"), col("c_mktsegment"), col("v_c"))
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_test").collect().map(_.toSeq).toSet
      val batchEv = Tables.load(spark, sf, "events")
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          round(col("value") * 100).cast(LongType).as("v_c"))
      val batch = batchEv.join(dim, batchEv("user_id") === dim("c_custkey"))
        .select(col("event_id"), col("c_mktsegment"), col("v_c"))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("mapGroupsWithState state survives a checkpointed restart") {
    import java.nio.file.Files
    import org.apache.spark.sql.Dataset
    val work = Files.createTempDirectory("graft_restart").toString
    val srcDir = s"$work/src"
    val ckpt = s"$work/ckpt"
    new java.io.File(srcDir).mkdirs()
    val raw = EventStreams.eventsAsRawNanos(spark, sf)

    // the emitted (cnt, total) per user, latest write wins — foreachBatch
    // runs on the driver, so a plain concurrent map collects safely
    val results = new scala.collection.concurrent.TrieMap[Long, (Long, Long)]()
    def startQuery() = {
      val stream = spark.readStream.schema(EventStreams.rawSchema).parquet(srcDir)
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      EventStreams.runningUserTotals(spark, stream)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: Dataset[(Long, Long, Long)], _: Long) =>
          batch.collect().foreach { case (u, c, t) => results(u) = (c, t) }
        }
        .start()
    }

    // phase 1: first half of the events
    raw.filter(col("event_id") % 2 === 0).write.mode("append").parquet(srcDir)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // hard stop — state must live in the checkpoint, not the JVM

    // phase 2: second half arrives after a restart from the checkpoint
    raw.filter(col("event_id") % 2 =!= 0).write.mode("append").parquet(srcDir)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val expected = Tables.load(spark, sf, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * 100).cast(LongType)).as("total_c"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val phase2Users = raw.filter(col("event_id") % 2 =!= 0)
        .select("user_id").distinct().collect().map(_.getLong(0))
      assert(phase2Users.nonEmpty)
      // users updated after the restart carry totals over BOTH halves —
      // only possible if phase-1 state was restored from the checkpoint
      phase2Users.foreach { u =>
        assert(results(u) === expected(u), s"user $u lost state across restart")
      }
      // and the state store itself reports every user ever seen
      val stateRows = q2.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows === expected.size,
        s"state store holds $stateRows rows, expected ${expected.size}")
    } finally q2.stop()
  }

  test("wire-format source (Kafka-shaped records): window agg and interval join match batch") {
    // the Kafka connector jar isn't in this zero-egress build, so the
    // claim under test is the adapter contract: ANY source delivering
    // (value: binary) JSON records — which is exactly what
    // format("kafka") emits — produces the same results as the file
    // source. MemoryStream plays the bus; eventsFromWire is the shared
    // decode path either source would feed.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.types.BinaryType
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val raw = EventStreams.eventsAsRawNanos(spark, sf)
    val jsonRecords = raw
      .select(to_json(struct(raw.columns.map(col): _*)).as("v"))
      .as[String].collect().toSeq

    val ms = MemoryStream[String]
    // Kafka value shape: binary payload, delivered in several batches
    val wire = ms.toDF().select(col("value").cast(BinaryType).as("value"))
    val events = EventStreams.eventsFromWire(wire)
    val qAgg = EventStreams.startMemorySink(
      EventStreams.hourlyByType(events, watermark = false), "wire_hourly")
    val qJoin = EventStreams.viewToPurchase(events)
      .writeStream.format("memory").queryName("wire_attr")
      .outputMode("append").start()
    try {
      jsonRecords.grouped(math.max(1, jsonRecords.size / 3)).foreach { batch =>
        ms.addData(batch ++ Seq("{not json", "")) // malformed records dropped
        qAgg.processAllAvailable()
        qJoin.processAllAvailable()
      }
      val hourly = spark.table("wire_hourly").collect().map(_.toSeq).toSet
      val hourlyBatch = EventStreams.hourlyByType(
        Tables.load(spark, sf, "events"), watermark = false)
        .collect().map(_.toSeq).toSet
      assert(hourly === hourlyBatch)
      assert(hourly.nonEmpty)
      val attr = spark.table("wire_attr")
        .select("user_id", "view_id", "purchase_id")
        .collect().map(_.toSeq).toSet
      val fileAttr = EventStreams.viewToPurchase(
        EventStreams.readEventsStream(spark, sf))
      val qFile = fileAttr.writeStream.format("memory").queryName("wire_attr_file")
        .outputMode("append").start()
      try {
        qFile.processAllAvailable()
        val fileSet = spark.table("wire_attr_file")
          .select("user_id", "view_id", "purchase_id")
          .collect().map(_.toSeq).toSet
        assert(attr === fileSet, "wire source and file source diverge on the interval join")
        assert(attr.nonEmpty)
      } finally qFile.stop()
    } finally { qAgg.stop(); qJoin.stop() }
  }
}
