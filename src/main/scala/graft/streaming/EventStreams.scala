package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

import graft.sources.TsLayout

/** Structured Streaming surface over the events table: the same logical
  * plans as the batch queries (`st1_tumbling_window`/`st2_sessionize`),
  * run incrementally. At scale this is the standing-pipeline form of the
  * engine: a streaming source → watermarked event-time aggregation →
  * sink, with state kept in the state store (RocksDB in production),
  * partitioned by group key.
  *
  * Every transform here takes a plain `DataFrame`, so the SOURCE is a
  * free variable: the file source ([[readEventsStream]]) is implemented
  * and tested end-to-end; a log bus plugs in through [[eventsFromWire]],
  * which adapts the (key, value: binary) record shape Kafka's connector
  * emits into the typed events frame. The Kafka connector jar itself
  * (`spark-sql-kafka-0-10`) is NOT shipped in this zero-egress build —
  * with it on the classpath, `spark.readStream.format("kafka")...` feeds
  * the same adapter; without it, the adapter is proven source-agnostic
  * against a MemoryStream delivering Kafka-shaped records (see
  * StreamingSpec "wire-format source").
  */
object EventStreams {

  /** The WIRE record schema: `ts` as raw epoch-nanos longs — the unit a
    * log bus ships ([[eventsFromWire]]'s contract). Parquet FILES may
    * carry `ts` in any unit the producer chose; [[readEventsStream]]
    * sniffs the footer and declares the file's own schema instead of
    * assuming this one (assuming it is exactly the bug a producer
    * switching NANOS→MICROS exposes: every event lands in 1970).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** file-source stream over a testdata directory. A streaming source
    * must DECLARE its schema up front, so the file's physical `ts` unit
    * is sniffed from the parquet footer first (one metadata HEAD-read,
    * [[graft.sources.TsLayout]]) and the declared schema + normalization
    * branch on it — the streaming twin of [[graft.sources.Tables.load]]'s
    * batch adaptivity, producing the identical `ts: TimestampNTZType`
    * µs frame for every layout.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = s"$dir/events.parquet"
    // batch-infer the file's own schema (sets the NANOS legacy flag only
    // if the footer says the file needs it), then declare it to the source
    val fileSchema = TsLayout.readRaw(spark, path).schema
    val hconf = spark.sessionState.newHadoopConf()
    val hpath = new org.apache.hadoop.fs.Path(path)
    val isDir = hpath.getFileSystem(hconf).getFileStatus(hpath).isDirectory
    val src =
      if (isDir)
        // production shape: the events table is a DIRECTORY of part files
        spark.readStream.schema(fileSchema).parquet(path)
      else
        // testdata shape: a single file next to the other tables —
        // FileStreamSource needs a directory basePath; glob the file out
        spark.readStream.schema(fileSchema)
          .option("pathGlobFilter", "events.parquet")
          .parquet(dir)
    TsLayout.normalizeTs(src)
  }

  /** The events table re-expressed in the WIRE shape ([[rawSchema]]:
    * `ts` as raw epoch-nanos longs) regardless of the file's physical
    * unit — the adapter the replay/parity specs use to feed real files
    * through wire-format sources and splice sentinel rows in one unit.
    */
  def eventsAsRawNanos(spark: SparkSession, dir: String): DataFrame =
    TsLayout.tsAsRawNanos(TsLayout.readRaw(spark, s"$dir/events.parquet"))
      .select(rawSchema.fieldNames.map(col): _*)

  /** Wire-format adapter: a log-bus record stream (Kafka's connector
    * emits `key: binary, value: binary, topic, partition, offset, …`)
    * carrying one JSON event per record value, `ts` in epoch nanoseconds
    * (the [[rawSchema]] wire contract), becomes the SAME typed frame
    * [[readEventsStream]] produces — so every downstream transform
    * (windows, dedup, interval joins, custom state) is source-agnostic.
    * Malformed records parse to NULL structs and are dropped explicitly
    * rather than poisoning the aggregation with all-NULL rows.
    */
  def eventsFromWire(records: DataFrame): DataFrame =
    TsLayout.normalizeTs(records
      .select(from_json(col("value").cast(StringType), rawSchema).as("e"))
      .filter(col("e").isNotNull)
      .select(col("e.event_id").as("event_id"), col("e.ts").as("ts"),
        col("e.user_id").as("user_id"), col("e.event_type").as("event_type"),
        col("e.value").as("value"), col("e.props").as("props")))

  /** tumbling event-time window aggregation; `withWatermark` bounds state
    * for append-mode sinks (late events beyond 1h are dropped). Watermarks
    * require TimestampType, so `ts` is always relabeled NTZ→TZ (pure under
    * the UTC session) — the output schema is identical with and without
    * the watermark, keeping stream/batch results union-compatible.
    */
  def hourlyByType(events: DataFrame, watermark: Boolean = true): DataFrame = {
    val cast = events.withColumn("ts", col("ts").cast(TimestampType))
    val src = if (watermark) cast.withWatermark("ts", "1 hour") else cast
    src.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast(LongType)).as("sum_c"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("cnt"), col("sum_c"))
  }

  /** Hourly unique users — streaming distinct-count via CHAINED stateful
    * operators: event-time dedup on (window, user) feeding a windowed
    * count. The dedup keys include the time-window column, so its state
    * expires with the watermark exactly like the aggregation's — both
    * stores stay bounded by (active windows × users per window), the
    * cardinality the query itself outputs, never by stream length. NULL
    * users are excluded (COUNT(DISTINCT …) semantics). The batch form is
    * the same plan; `st8_hourly_uniques` oracle-checks it.
    */
  def hourlyUniques(events: DataFrame, watermark: Boolean = true): DataFrame = {
    val cast = events.withColumn("ts", col("ts").cast(TimestampType))
    val src = if (watermark) cast.withWatermark("ts", "1 hour") else cast
    src.filter(col("user_id").isNotNull)
      .select(window(col("ts"), "1 hour").as("win"), col("user_id"))
      .dropDuplicates("win", "user_id")
      .groupBy(col("win"))
      .agg(count(lit(1)).as("uniques"))
      .select(col("win.start").as("hour"), col("uniques"))
  }

  /** Session-window aggregation — the third event-time window kind next
    * to tumbling ([[hourlyByType]]) and sliding: a per-user session stays
    * open while events keep arriving within `gap` of the previous one and
    * spans [first event, last event + gap). Streaming state is one
    * (possibly merging) window per open session per user and expires with
    * the watermark, so it is bounded by concurrently-open sessions, never
    * stream length. An event landing exactly `gap` after the previous one
    * starts a NEW session (the window is half-open). Batch twin:
    * `st10_session_stats` — same plan over the static table, oracle-checked
    * against the gaps-and-islands rewrite (`LAG` + cumulative flag), which
    * is also how the sessionization would be expressed without native
    * session windows (st2).
    */
  def userSessions(events: DataFrame, gap: String = "30 minutes",
      watermark: Boolean = true): DataFrame = {
    val cast = events.withColumn("ts", col("ts").cast(TimestampType))
    val src = if (watermark) cast.withWatermark("ts", gap) else cast
    src.filter(col("user_id").isNotNull)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast(LongType)).as("value_c"))
      .select(col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"),
        col("user_id"), col("n_events"), col("value_c"))
  }

  /** Stream-static enrichment join: every event joins a STATIC dimension
    * snapshot (re-planned per micro-batch, broadcast — the stream never
    * shuffles for the join), then flows into the watermarked windowed
    * aggregate. This is the standing-pipeline form of fact-enrichment:
    * at 100 TB/day the stream side stays partition-local and only the
    * (small, measured) dim is shipped. Batch twin: `st9_segment_revenue`
    * (same plan over the static tables; oracle-checked).
    */
  def hourlyBySegment(events: DataFrame, customers: DataFrame,
      watermark: Boolean = true): DataFrame = {
    val cast = events.withColumn("ts", col("ts").cast(TimestampType))
    val src = if (watermark) cast.withWatermark("ts", "1 hour") else cast
    val dim = broadcast(customers.select(col("c_custkey"), col("c_mktsegment")))
    src.join(dim, col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour"), col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast(LongType)).as("sum_c"))
      .select(col("window.start").as("hour"),
        col("c_mktsegment").as("segment"), col("cnt"), col("sum_c"))
  }

  /** running per-user aggregate via mapGroupsWithState — the custom-state
    * extension point (the streaming analog of the reference's
    * `sql_groupby_apply`, SURVEY §2.5)
    */
  def runningUserTotals(spark: SparkSession, events: DataFrame): Dataset[(Long, Long, Long)] = {
    import spark.implicits._
    events.select(col("user_id"), round(col("value") * 100).cast(LongType).as("v_c"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Long, Long), (Long, Long, Long)](GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[(Long, Long)]) =>
          val (cnt0, sum0) = state.getOption.getOrElse((0L, 0L))
          var cnt = cnt0
          var total = sum0
          rows.foreach { case (_, v) => cnt += 1; total += v }
          state.update((cnt, total))
          (user, cnt, total)
      }
  }

  /** Streaming exact-dedup — the standing-pipeline form of `dd1`: drop
    * re-delivered events by key, keeping state only within the watermark
    * horizon (`dropDuplicatesWithinWatermark`), so state is bounded by
    * (arrival rate × horizon) instead of growing forever. The batch
    * equivalent at any point in time is `dropDuplicates(keys)` over the
    * files seen so far.
    */
  def dedupStream(events: DataFrame, keys: Seq[String],
      horizon: String = "1 hour"): DataFrame =
    events.withColumn("ts", col("ts").cast(TimestampType))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-stream interval join: view → purchase attribution per user
    * within `window` after the view. Both sides are watermarked; the
    * time-bound condition lets Spark expire join state — an unbounded
    * stream join would otherwise hold every row forever. State is
    * partitioned by the equi-key (user), the same shuffle shape as the
    * batch join.
    */
  def viewToPurchase(events: DataFrame, window: String = "1 hour"): DataFrame = {
    val base = events.withColumn("ts", col("ts").cast(TimestampType))
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", window)
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", window)
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $window"))
      .select(col("v_user").as("user_id"), col("view_id"),
        col("purchase_id"), col("v_ts"), col("p_ts"))
  }

  /** LEFT-OUTER stream-stream interval join: every view, matched to the
    * purchases within `window` after it — or emitted once with NULL
    * purchase columns when the watermark proves no purchase can arrive
    * (abandonment detection, the training-label form of attribution:
    * "did this impression convert?").
    *
    * Outer emission is the genuinely streaming-hard part: an unmatched
    * view is not a result until time runs out on it. Spark holds the
    * view in join state and emits the NULL row only when the watermark
    * passes `v_ts + window` — so the null-side results trail the input
    * by the window + watermark delay, and a terminal micro-batch needs
    * the watermark advanced past the last view's deadline before its
    * NULL row appears (the parity spec feeds a flush sentinel for
    * exactly this). Same state partitioning and eviction bounds as the
    * inner form: keyed by user, expired at the interval bound.
    */
  def viewToPurchaseOuter(events: DataFrame,
      window: String = "1 hour"): DataFrame = {
    val base = events.withColumn("ts", col("ts").cast(TimestampType))
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
      .withWatermark("v_ts", window)
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", window)
    views.join(purchases,
      col("v_user") === col("p_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr(s"INTERVAL $window"),
      "left_outer")
      .select(col("v_user").as("user_id"), col("view_id"),
        col("purchase_id"), col("v_ts"), col("p_ts"))
  }

  /** start a complete-mode in-memory sink (testing / local inspection) */
  def startMemorySink(df: DataFrame, name: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()

  /** The exactly-once file-sink batch writer: micro-batch `id` lands in
    * its own `batch_id=<id>` partition directory with OVERWRITE mode, so
    * a replayed batch (failure after write, before the checkpoint
    * commit — the at-least-once window every streaming sink must close)
    * rewrites its own directory instead of appending duplicates. The
    * (checkpoint, partition-overwrite) pair is what makes file output
    * end-to-end exactly-once; readers see `path` as ordinary
    * hive-partitioned parquet. Exposed separately from [[startIdempotentSink]]
    * so the replay property is directly testable (StreamingSpec re-runs
    * a batch id through it and asserts the read-back is unchanged).
    */
  def idempotentBatchWriter(path: String): (DataFrame, Long) => Unit =
    (batch, id) =>
      batch.withColumn("batch_id", lit(id))
        .write.mode("overwrite")
        .partitionBy("batch_id")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)

  /** append-mode streaming → hive-partitioned parquet, exactly-once via
    * [[idempotentBatchWriter]] + the query checkpoint */
  def startIdempotentSink(df: DataFrame, path: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .foreachBatch(idempotentBatchWriter(path))
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append()).start()
}
