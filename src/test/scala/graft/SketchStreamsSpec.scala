package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sketches
import graft.sources.Tables
import graft.streaming.SketchStreams

/** Streaming Misra–Gries heavy hitters: the merged stream sketch plus an
  * exact recount must return EXACTLY the batch heavyHitters output on the
  * same keys, however the stream was micro-batched, and the stream state
  * must stay bounded at groups × k entries.
  */
class SketchStreamsSpec extends SparkSpec {
  import spark.implicits._

  private val ppm = 20000L // 2% support
  private val k = Sketches.sketchSizeFor(ppm)

  private def keys(): Seq[String] = Tables.load(spark, sf, "events")
    .filter(col("user_id").isNotNull)
    .select(col("user_id").cast("string")).as[String]
    .collect().toSeq

  test("streamed sketch + exact recount == batch heavyHitters (4 micro-batches)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ks = keys()
    val groups = 8
    val ms = MemoryStream[String]
    val q = SketchStreams.mgStream(ms.toDS(), k, groups)
      .writeStream.format("memory").queryName("mg_test")
      .outputMode("update").start()
    try {
      ks.grouped(math.max(1, ks.size / 4)).foreach { b =>
        ms.addData(b); q.processAllAvailable()
      }
      // latest summary per group
      val partials = spark.table("mg_test")
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("group").orderBy(col("ver").desc)))
        .filter(col("rn") === 1).drop("rn")
        .as[graft.streaming.MGPartial].collect().toSeq

      // bounded state: every summary carries at most k entries
      assert(partials.forall(_.keys.length <= k))
      assert(partials.map(_.n).sum == ks.size.toLong)

      val (n, summary) = SketchStreams.merge(partials, k)
      assert(n == ks.size.toLong)
      assert(summary.size <= k)

      // candidate -> exact recount, as the batch second pass does
      val minFreq = (ppm * n + 999999L) / 1000000L
      val slack = n / k
      val candidates = summary.collect {
        case (key, est) if est >= minFreq - slack => key
      }.toSet
      val exact = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val streamedHH = candidates.toSeq
        .map(c => c -> exact.getOrElse(c, 0L))
        .filter(_._2 >= minFreq).toMap

      val batchHH = Sketches.heavyHitters(
        Tables.load(spark, sf, "events").filter(col("user_id").isNotNull)
          .select(col("user_id").cast("string").as("k")), "k", ppm)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

      assert(batchHH.nonEmpty, "support threshold leaves no heavy hitters — test is vacuous")
      assert(streamedHH == batchHH,
        s"stream: ${streamedHH.toSeq.sorted}\nbatch: ${batchHH.toSeq.sorted}")
    } finally q.stop()
  }

  test("micro-batching does not change the final answer (1 batch vs many)") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ks = keys()
    val groups = 4

    def finalHH(batchSizes: Int): Map[String, Long] = {
      val ms = MemoryStream[String]
      val name = s"mg_chunks_$batchSizes"
      val q = SketchStreams.mgStream(ms.toDS(), k, groups)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        ks.grouped(batchSizes).foreach { b => ms.addData(b); q.processAllAvailable() }
        val partials = spark.table(name)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("group").orderBy(col("ver").desc)))
          .filter(col("rn") === 1).drop("rn")
          .as[graft.streaming.MGPartial].collect().toSeq
        val (n, summary) = SketchStreams.merge(partials, k)
        val minFreq = (ppm * n + 999999L) / 1000000L
        val slack = n / k
        val exact = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
        summary.collect { case (key, est) if est >= minFreq - slack => key }
          .map(c => c -> exact.getOrElse(c, 0L))
          .filter(_._2 >= minFreq).toMap
      } finally q.stop()
    }

    assert(finalHH(ks.size) == finalHH(97))
  }

  test("streamed KMV sketch is bit-for-bit the batch sketch, any micro-batching") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ks = keys()
    val kk = 64
    val groups = 4

    // batch truth: bottom-kk of all distinct md5('kmv:'||key)
    val batchSketch = ks.distinct.map(x => SketchStreams.md5Hex("kmv:" + x))
      .sorted.take(kk).toArray

    def streamed(chunk: Int): Array[String] = {
      val ms = MemoryStream[String]
      val name = s"kmv_chunks_$chunk"
      val q = SketchStreams.kmvStream(ms.toDS(), kk, groups)
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        ks.grouped(chunk).foreach { b => ms.addData(b); q.processAllAvailable() }
        val partials = spark.table(name)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy("group").orderBy(col("ver").desc)))
          .filter(col("rn") === 1).drop("rn")
          .as[graft.streaming.KmvPartial].collect().toSeq
        assert(partials.forall(_.hashes.length <= kk)) // bounded state
        SketchStreams.kmvMerge(partials, kk)
      } finally q.stop()
    }

    assert(streamed(ks.size).sameElements(batchSketch))
    assert(streamed(111).sameElements(batchSketch))
  }
}
