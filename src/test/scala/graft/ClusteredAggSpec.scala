package graft

import org.apache.spark.sql.functions._
import graft.operators.ClusteredAgg

/** groupByClustered: exchange-free on verified layouts, standard plan on
  * unverifiable ones, identical results always.
  */
class ClusteredAggSpec extends SparkSpec {

  private def tmp(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-clusteredagg/$name"

  private lazy val clusteredPath: String = {
    val p = tmp("clustered")
    spark.range(0, 100000)
      .select((col("id") / 7).cast("long").as("k"), (col("id") % 13).as("v"))
      .repartitionByRange(8, col("k"))
      .write.mode("overwrite").parquet(p)
    p
  }

  private lazy val randomPath: String = {
    val p = tmp("random")
    spark.range(0, 100000)
      .select(pmod(hash(col("id")), lit(500)).cast("long").as("k"),
        (col("id") % 13).as("v"))
      .repartition(8) // round-robin: keys scattered across every file
      .write.mode("overwrite").parquet(p)
    p
  }

  test("clustered layout: no exchange, results equal the shuffle plan") {
    val df = spark.read.parquet(clusteredPath)
    assert(ClusteredAgg.isKeyClustered(df, "k"), "range-written layout not detected")
    val fast = ClusteredAgg.groupByClustered(df, "k",
      Seq(sum("v").as("s"), count(lit(1)).as("c")))
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"clustered agg still shuffles:\n$plan")
    val slow = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
    assert(fast.orderBy("k").collect().toSeq == slow.orderBy("k").collect().toSeq)
  }

  test("random layout: falls back to the standard shuffle aggregate") {
    val df = spark.read.parquet(randomPath)
    assert(!ClusteredAgg.isKeyClustered(df, "k"), "scattered layout misdetected as clustered")
    val agg = ClusteredAgg.groupByClustered(df, "k", Seq(sum("v").as("s")))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange"), s"fallback lost its exchange:\n$plan")
    assert(agg.orderBy("k").collect().toSeq ==
      df.groupBy("k").agg(sum("v").as("s")).orderBy("k").collect().toSeq)
  }

  test("join downstream of a clustered agg shuffles this side and is correct") {
    // the adversarial shape from the r5 verdict: the other join side is
    // genuinely hash-partitioned by the key with the SAME partition count
    // the clustered side claims. A partitioning that over-claims (the old
    // HashPartitioning) makes EnsureRequirements elide this side's join
    // exchange and silently mis-join; ClusteredOnlyPartitioning must
    // refuse the co-partitioning contract and take a real shuffle.
    val df = spark.read.parquet(clusteredPath)
    assert(ClusteredAgg.isKeyClustered(df, "k"))
    val agg = ClusteredAgg.groupByClustered(df, "k",
      Seq(sum("v").as("s")))
    val claimed = agg.rdd.getNumPartitions // scan-partition count the claim carries
    val dim = spark.range(0, 20000)
      .select(col("id").as("k"), (col("id") % 5).as("grp"))
      .repartition(claimed, col("k"))
    val fast = agg.join(dim.hint("merge"), "k")
      .orderBy("k").collect().toSeq
    val slow = df.groupBy("k").agg(sum("v").as("s"))
      .join(dim.hint("merge"), "k").orderBy("k").collect().toSeq
    assert(fast == slow, "join downstream of groupByClustered diverged")
  }

  test("global aggregates over groupByClustered get their exchange (multi-partition)") {
    // regression for the AllTuples hole: the scan declares
    // UnknownPartitioning(0); a partitioning that clamps that to 1 claims
    // AllTuples vacuously, and a global aggregate (count, global sum)
    // over the clustered output then skips its singleton exchange and
    // returns PARTITION 0's result only. Caught at the 100x replica as
    // count() = exactly 1/100 of the truth. Force a genuinely
    // multi-partition scan (one partition per file) and require global
    // aggregates to match the shuffle plan.
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try {
      val df = spark.read.parquet(clusteredPath)
      assert(df.rdd.getNumPartitions > 1, "layout must span several scan partitions")
      assert(ClusteredAgg.isKeyClustered(df, "k"))
      val agg = ClusteredAgg.groupByClustered(df, "k",
        Seq(sum("v").as("s"), count(lit(1)).as("c")))
      val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      assert(agg.count() === plain.count(), "count() lost partitions")
      assert(agg.agg(sum("s"), sum("c")).head().toSeq ===
        plain.agg(sum("s"), sum("c")).head().toSeq, "global sum lost partitions")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("clustered agg span COMPILES under whole-stage codegen (no silent fallback)") {
    // r6 verdict: AssumeClusteredExec.doConsume forwarded directly to
    // parent.doConsume, bypassing consume()'s bookkeeping (input-variable
    // materialization, function splitting), so when the aggregate's consume
    // path was split into a separate Java method it referenced the scan's
    // loop-local variable out of scope — janino failed and Spark SILENTLY
    // ran the whole span interpreted. 133 green tests missed it because
    // results stay correct. Compile every generated span explicitly here:
    // a codegen regression now fails the build instead of logging a WARN.
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    import graft.plans.AssumeClusteredExec
    val df = spark.read.parquet(clusteredPath)
    assert(ClusteredAgg.isKeyClustered(df, "k"))
    // the q18 shape: many aggregates widen the consume path past the
    // method-split threshold, which is exactly the path that broke
    val fast = ClusteredAgg.groupByClustered(df, "k",
      Seq(sum("v").as("s"), count(lit(1)).as("c"), avg("v").as("m"),
        min("v").as("lo"), max("v").as("hi"), sum(col("v") * col("v")).as("s2"),
        count(when(col("v") > 6, 1)).as("chi"), sum(when(col("v") % 2 === 0, col("v"))).as("se")))
    fast.collect() // materialize the AQE final plan (fallback keeps results right)
    // AdaptiveSparkPlanExec and QueryStageExec are leaf wrappers; the
    // helper's collect sees through both
    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    val finalPlan = fast.queryExecution.executedPlan
    val spans = helper.collect(finalPlan) {
      case w: WholeStageCodegenExec => w
    }
    val fused = spans.filter(_.exists(_.isInstanceOf[AssumeClusteredExec]))
    assert(fused.nonEmpty,
      s"AssumeClusteredExec sits outside every codegen span:\n$finalPlan")
    fused.foreach { w =>
      val (_, src) = w.doCodeGen()
      CodeGenerator.compile(src) // throws CompileException on invalid codegen
    }
  }

  test("NULL keys force the fallback even on a clustered layout") {
    val p = tmp("nulls")
    spark.range(0, 1000)
      .select(when(col("id") % 100 === 0, lit(null)).otherwise(col("id")).as("k"),
        lit(1L).as("v"))
      .repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(p)
    val df = spark.read.parquet(p)
    assert(!ClusteredAgg.isKeyClustered(df, "k"))
    val agg = ClusteredAgg.groupByClustered(df, "k", Seq(sum("v").as("s")))
    assert(agg.count() === df.select("k").distinct().count())
  }
}
