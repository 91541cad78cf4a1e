package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.AggSpec
import graft.streaming.RetractionMaintenance

/** Streaming retraction parity: the counting-algebra view folded over a
  * signed CDC changelog stream must equal the batch recompute of the
  * edited fact set — under any micro-batching, including one that
  * splits an update's −old/+new pair across triggers.
  */
class RetractionStreamSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val aggs = Seq(AggSpec("v", "sum", "v_sum"),
    AggSpec("v", "count", "v_cnt"))

  // changelog: inserts for 40 facts, then deletes of every 3rd, then
  // updates (−old/+new adjacent — batching may split them), then a
  // group fully retracted and one left all-NULL
  private def changelog: Seq[(String, Option[Long], Long)] = {
    val base = (1 to 40).map { i =>
      (s"g${i % 5}", if (i % 7 == 0) None else Some(i.toLong), 1L)
    }
    val dels = (1 to 40).filter(_ % 3 == 0).map { i =>
      (s"g${i % 5}", if (i % 7 == 0) Option.empty[Long] else Some(i.toLong), -1L)
    }
    val upds = (1 to 40).filter(i => i % 3 != 0 && i % 4 == 0).flatMap { i =>
      val old = if (i % 7 == 0) Option.empty[Long] else Some(i.toLong)
      Seq((s"g${i % 5}", old, -1L),
        (s"g${i % 5}", old.map(_ + 500L), 1L))
    }
    // group gz: born, then fully retracted; group gn: only NULL measures
    val gz = Seq(("gz", Some(9L), 1L), ("gz", Some(9L), -1L))
    val gn = Seq(("gn", Option.empty[Long], 1L),
      ("gn", Option.empty[Long], 1L))
    base ++ dels ++ upds ++ gz ++ gn
  }

  private def editedBatch() = {
    // replay the changelog as a plain bag and recompute from scratch
    val bag = scala.collection.mutable.ArrayBuffer[(String, Option[Long])]()
    changelog.foreach { case (k, v, s) =>
      if (s > 0) bag += ((k, v))
      else bag.remove(bag.indexOf((k, v)))
    }
    IncrementalAgg.publishCounting(
      IncrementalAgg.aggregateCounting(bag.toSeq.toDF("k", "v"), keys, aggs),
      keys, aggs)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("streamed signed changelog == batch recompute under any batching") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val expected = rows(editedBatch())
    // batch sizes 1 (every −old/+new pair split), 7 (pairs straddle
    // boundaries), and one big trigger
    for (chunk <- Seq(1, 7, changelog.size)) {
      val ms = MemoryStream[(String, Option[Long], Long)]
      val rm = new RetractionMaintenance(spark, keys, aggs)
      val q = rm.attach(ms.toDF().toDF("k", "v", "_sign")).start()
      try {
        changelog.grouped(chunk).foreach { b =>
          ms.addData(b); q.processAllAvailable()
        }
        assert(rows(rm.view.get) === expected, s"diverged at chunk=$chunk")
      } finally q.stop()
    }
  }

  test("fully retracted group is absent; all-NULL group publishes NULL sum") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Option[Long], Long)]
    val rm = new RetractionMaintenance(spark, keys, aggs)
    val q = rm.attach(ms.toDF().toDF("k", "v", "_sign")).start()
    try {
      changelog.grouped(5).foreach { b => ms.addData(b); q.processAllAvailable() }
      val v = rm.view.get
      assert(v.filter(col("k") === "gz").count() === 0L)
      val gn = v.filter(col("k") === "gn").head()
      assert(gn.isNullAt(1) && gn.getLong(2) === 0L)
    } finally q.stop()
  }
}
