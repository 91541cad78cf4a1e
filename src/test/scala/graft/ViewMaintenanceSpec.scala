package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.AggSpec
import graft.sources.Tables
import graft.streaming.ViewMaintenance

/** Streaming join-view maintenance parity: the view folded over a fact
  * stream must equal the batch buildJoinView on the same facts and the
  * dimension as of now — under different micro-batchings, arrival
  * orders, and dim-delta interleavings.
  */
class ViewMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k")
  private val groups = Seq("g")
  private val aggs = Seq(AggSpec("v", "sum", "v_sum"),
    AggSpec("v", "count", "v_cnt"),
    AggSpec("v", "min", "v_min"), AggSpec("v", "max", "v_max"))

  private def facts() = Tables.load(spark, sf, "events")
    .filter(col("user_id").isNotNull)
    .select(col("user_id").as("k"),
      round(col("value") * 100).cast("long").as("v"))
    .as[(Long, Long)].collect().toSeq.sortBy(identity)

  private def dim() = Tables.load(spark, sf, "customer")
    .select(col("c_custkey").as("k"), col("c_mktsegment").as("g"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("streamed view == batch view under different batchings") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val fs = facts()
    val expected = rows(IncrementalAgg.buildJoinView(
      fs.toDF("k", "v"), dim(), keys, groups, aggs).view)
    // -4 streams in reverse order: the key-grain fold is commutative,
    // so late-arriving early facts must land on the identical view
    for (nBatches <- Seq(1, 4, -4)) {
      val ms = MemoryStream[(Long, Long)]
      val vm = new ViewMaintenance(spark, dim(), keys, groups, aggs)
      val q = vm.attach(ms.toDF().toDF("k", "v")).start()
      try {
        val ordered = if (nBatches < 0) fs.reverse else fs
        ordered.grouped(math.max(1, fs.size / math.abs(nBatches)))
          .foreach { b => ms.addData(b); q.processAllAvailable() }
        assert(rows(vm.view.get) === expected,
          s"view diverged at $nBatches batches")
      } finally q.stop()
    }
  }

  test("dim deltas interleaved mid-stream land on the post-churn view") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val fs = facts()
    val d = dim()
    // churn: every 10th key moves to a synthetic segment, every 25th is
    // deleted — applied BETWEEN the second and third of four triggers
    val changes = d.filter(col("k") % 10 === 0 || col("k") % 25 === 0)
      .select(col("k"),
        when(col("k") % 25 === 0, col("g")).otherwise(lit("MOVED")).as("g"),
        when(col("k") % 25 === 0, lit("D")).otherwise(lit("U")).as("op"))
    val dimNew = d.filter(!(col("k") % 25 === 0))
      .withColumn("g",
        when(col("k") % 10 === 0, lit("MOVED")).otherwise(col("g")))
    val expected = rows(IncrementalAgg.buildJoinView(
      fs.toDF("k", "v"), dimNew, keys, groups, aggs).view)

    val ms = MemoryStream[(Long, Long)]
    val vm = new ViewMaintenance(spark, d, keys, groups, aggs)
    val q = vm.attach(ms.toDF().toDF("k", "v")).start()
    try {
      val quarters = fs.grouped(math.max(1, fs.size / 4)).toSeq
      quarters.take(2).foreach { b => ms.addData(b); q.processAllAvailable() }
      vm.applyDimDelta(changes)
      quarters.drop(2).foreach { b => ms.addData(b); q.processAllAvailable() }
      assert(rows(vm.view.get) === expected)
    } finally q.stop()
  }

  test("state stays flat: many triggers do not grow the view plan") {
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Long)]
    val vm = new ViewMaintenance(spark,
      Seq((1L, "a"), (2L, "b")).toDF("k", "g"), keys, groups, aggs)
    val q = vm.attach(ms.toDF().toDF("k", "v")).start()
    try {
      (1 to 30).foreach { i =>
        ms.addData(Seq((1L, i.toLong), (2L, i.toLong)))
        q.processAllAvailable()
      }
      // localCheckpoint per merge: the published view's plan must be a
      // handful of nodes over the checkpointed state, not 30 stacked
      // refreshes
      val planLines = vm.view.get.queryExecution.optimizedPlan.toString
        .linesIterator.size
      assert(planLines < 20, s"view plan grew to $planLines lines")
      val r = vm.view.get.orderBy("g").collect()
      assert(r.map(_.getLong(1)).toSeq === Seq(465L, 465L))
    } finally q.stop()
  }
}
