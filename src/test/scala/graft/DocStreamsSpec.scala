package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables
import graft.streaming.DocStreams

/** Streaming near-dup dedup parity: the pair set emitted over a document
  * stream must equal the batch MinHash-LSH pipeline's verified pairs on
  * the same corpus, regardless of how the stream was micro-batched, and
  * re-delivery must not re-pair.
  */
class DocStreamsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text")).as[(Long, String)]
    .collect().toSeq.sortBy(_._1)

  test("streamed near-dup pairs == batch minHashDedup pairs (3 micro-batches)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus()
    val ms = MemoryStream[(Long, String)]
    val q = DocStreams.nearDupPairs(spark,
        ms.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("docdedup_test")
      .outputMode("append").start()
    try {
      docs.grouped(math.max(1, docs.size / 3)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      val streamed = spark.table("docdedup_test")
        .select("ida", "idb").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Dedup.minHashDedup(
        Tables.load(spark, sf, "documents"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch,
        "stream pair set diverged from the batch pipeline")
      assert(streamed.nonEmpty)

      // re-delivery (at-least-once source): replaying a full batch adds
      // NO pairs — known ids are no-ops in bucket state
      val before = spark.table("docdedup_test").count()
      ms.addData(docs.take(docs.size / 3))
      q.processAllAvailable()
      assert(spark.table("docdedup_test").count() === before,
        "re-delivered docs re-paired")

      // and the per-doc verdict form agrees with the pair set: each
      // flagged doc names a smaller near-duplicate
      streamed.foreach { case (a, b) => assert(a < b) }
    } finally q.stop()
  }

  test("micro-batch boundaries don't change the emitted set (1 batch vs 5)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus()
    def run(parts: Int, name: String): Set[(Long, Long)] = {
      val ms = MemoryStream[(Long, String)]
      val q = DocStreams.nearDupPairs(spark,
          ms.toDF().toDF("doc_id", "text"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        docs.grouped(math.max(1, docs.size / parts)).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
        spark.table(name).select("ida", "idb").distinct()
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally q.stop()
    }
    assert(run(1, "docdedup_one") === run(5, "docdedup_five"))
  }

  test("degenerate bucket stops emitting at maxBucket (skew guard)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // 12 identical docs: every band bucket gets all 12; cap at 5 — the
    // first 5 pair (C(5,2)=10 pairs), then the bucket marks itself
    // overflowed and drops its payloads instead of exploding m^2
    val ms = MemoryStream[(Long, String)]
    val q = DocStreams.nearDupPairs(spark,
        ms.toDF().toDF("doc_id", "text"), maxBucket = 5)
      .writeStream.format("memory").queryName("docdedup_cap")
      .outputMode("append").start()
    try {
      ms.addData((0 until 12).map(i =>
        (i.toLong, "the same boilerplate text repeated across the corpus")))
      q.processAllAvailable()
      val pairs = spark.table("docdedup_cap")
        .select("ida", "idb").distinct().count()
      assert(pairs === 10L, s"cap not enforced: $pairs pairs")
    } finally q.stop()
  }

  test("windowed retention: in-horizon parity with batch, out-of-horizon drop") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus()
    val hourMs = 3600L * 1000
    // deterministic event times: doc i lands at base + (i % 7) hours,
    // except every 4th doc which lands 10 days later — outside a 1-day
    // horizon of everything else. base > 0: an event time of EXACTLY
    // epoch 0 equals Spark's initial watermark and is dropped as late.
    val base = 48L * hourMs
    def ts(id: Long): Long =
      if (id % 4 == 0) base + 240L * hourMs + (id % 7) * hourMs
      else base + (id % 7) * hourMs
    val ms = MemoryStream[(Long, String, java.sql.Timestamp)]
    val horizon = 24L * hourMs
    val q = DocStreams.nearDupPairsWindowed(spark,
        ms.toDF().toDF("doc_id", "text", "ts")
          .withWatermark("ts", "0 seconds"),
        horizonMs = horizon)
      .writeStream.format("memory").queryName("docdedup_win")
      .outputMode("append").start()
    try {
      // early docs first, then the late cohort — watermark moves forward
      val (late, early) = docs.partition(_._1 % 4 == 0)
      Seq(early, late).foreach { b =>
        ms.addData(b.map { case (id, t) =>
          (id, t, new java.sql.Timestamp(ts(id))) })
        q.processAllAvailable()
      }
      val streamed = spark.table("docdedup_win")
        .select("ida", "idb").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batchAll = Dedup.minHashDedup(
        Tables.load(spark, sf, "documents"), "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = batchAll.filter { case (a, b) =>
        math.abs(ts(a) - ts(b)) <= horizon }
      assert(streamed === want,
        "windowed stream diverged from horizon-restricted batch pairs")
      assert(streamed.nonEmpty && streamed != batchAll,
        "fixture must exercise both in- and out-of-horizon pairs")
      // state-size bound: after the late cohort advanced the watermark
      // 10 days, every early bucket is beyond the horizon and must have
      // been REMOVED from the store — state rows track only the last
      // cohort's buckets, not corpus age
      val lastState = q.lastProgress.stateOperators.head.numRowsTotal
      val lateOnly = {
        val ms2 = MemoryStream[(Long, String, java.sql.Timestamp)]
        val q2 = DocStreams.nearDupPairsWindowed(spark,
            ms2.toDF().toDF("doc_id", "text", "ts")
              .withWatermark("ts", "0 seconds"),
            horizonMs = horizon)
          .writeStream.format("memory").queryName("docdedup_win_late")
          .outputMode("append").start()
        try {
          ms2.addData(late.map { case (id, t) =>
            (id, t, new java.sql.Timestamp(ts(id))) })
          q2.processAllAvailable()
          q2.lastProgress.stateOperators.head.numRowsTotal
        } finally q2.stop()
      }
      assert(lastState <= lateOnly,
        s"expired buckets not evicted: $lastState state rows vs $lateOnly for the late cohort alone")
    } finally q.stop()
  }

  test("streaming cluster maintenance == batch clustering (3 micro-batches)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus()
    val ms = MemoryStream[(Long, String)]
    val cm = new graft.streaming.ClusterMaintenance(spark)
    val q = cm.attach(DocStreams.nearDupPairs(spark,
        ms.toDF().toDF("doc_id", "text")))
      .start()
    try {
      docs.grouped(math.max(1, docs.size / 3)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      val inc = cm.labels
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val full = Dedup.connectedComponents(Dedup.minHashDedup(
          Tables.load(spark, sf, "documents"), "doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(inc === full,
        "streamed labeling diverged from batch clustering")
      assert(inc.nonEmpty)
    } finally q.stop()
  }

  test("cluster maintenance is micro-batching invariant (1 vs 5 batches)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = corpus()
    def run(parts: Int): Map[Long, Long] = {
      val ms = MemoryStream[(Long, String)]
      val cm = new graft.streaming.ClusterMaintenance(spark)
      val q = cm.attach(DocStreams.nearDupPairs(spark,
          ms.toDF().toDF("doc_id", "text")))
        .start()
      try {
        docs.grouped(math.max(1, docs.size / parts)).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
        cm.labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally q.stop()
    }
    assert(run(1) === run(5))
  }

  test("band-bucket keyed state survives a checkpointed restart: " +
      "cross-phase pairs still emit") {
    // the fleet handles recover driver state via save/resume; the keyed
    // band buckets recover via Spark's CHECKPOINT — this is that half of
    // the restart posture, on the flagship dedup stream. A hard stop
    // kills the JVM-side state; phase-2 docs can only pair with phase-1
    // docs if the bucket members were restored from the state store.
    import java.nio.file.Files
    val work = Files.createTempDirectory("graft_dedup_restart").toString
    val srcDir = s"$work/src"
    val outDir = s"$work/out"
    val ckpt = s"$work/ckpt"
    new java.io.File(srcDir).mkdirs()
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "text")

    def startQuery() = {
      val stream = spark.readStream.schema(docs.schema).parquet(srcDir)
      DocStreams.nearDupPairs(spark, stream)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()
    }

    docs.filter(col("doc_id") % 2 === 0).write.mode("append").parquet(srcDir)
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop() // hard stop — bucket state must live in the checkpoint

    docs.filter(col("doc_id") % 2 =!= 0).write.mode("append").parquet(srcDir)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      val streamed = spark.read.parquet(outDir)
        .select("ida", "idb").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = Dedup.minHashDedup(docs, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch,
        "restarted stream's pair set diverged from the batch pipeline")
      // the assertion with teeth: pairs spanning the restart boundary
      val crossPhase = batch.filter { case (a, b) => a % 2 != b % 2 }
      assert(crossPhase.nonEmpty,
        "fixture failure: no near-dup pair spans the even/odd split")
      assert(crossPhase.subsetOf(streamed),
        "cross-restart pairs missing — bucket state not recovered")
    } finally q2.stop()
  }
}
