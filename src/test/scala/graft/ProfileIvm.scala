package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.operators.IncrementalAgg
import graft.operators.IncrementalAgg.AggSpec

/** Scale measurement for join-view maintenance (Test/runMain) —
  * committed as IVM_MEASURE.json.
  *
  * The claim to quantify: refreshJoinView's cost is |ΔF| + key-grain /
  * dim-grain / view-grain splices, INDEPENDENT of the stored fact
  * history — the recompute's cost is the history. Star-schema shape:
  * facts = lineitem (scales 100×), join key = l_partkey % 20000 (the
  * dim stays 20k keys at every scale, as a real warehouse dim would),
  * 1% materialized fact delta + 1% dim churn, state read from parquet.
  *
  * Two measurements per scale, because wall time alone under-reports
  * the win at local gate scales (a 6M-row scan is sub-second on 32
  * threads while the refresh pays ~10 small-stage schedulings):
  *  - `*_sec`: warm wall, min of 2 — the refresh side must stay FLAT
  *    across 100x fact growth (its only fact-dependent term is the
  *    delta), while the recompute side scales with the history;
  *  - `*_facts_mb`: bytes of the stored FACT files the physical plan
  *    scans (FileSourceScanExec file listings x on-disk sizes) — the
  *    no-rescan property in bytes: 0 for the refresh at every scale.
  *    At 100 TB those bytes are the wall clock.
  */
object ProfileIvm {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def measured(f: => Long): (Long, Double) = {
      f // warmup
      var best = Double.MaxValue; var rows = 0L
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        rows = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (rows, math.round(best * 1000) / 1000.0)
    }
    // bytes of the stored-fact files the plan's scans actually list
    def factsMb(df: org.apache.spark.sql.DataFrame): Double = {
      val files = df.queryExecution.sparkPlan.collect {
        case s: FileSourceScanExec => s
      }.flatMap(_.relation.location.inputFiles)
        .filter(_.contains("/facts"))
      val bytes = files.map(f =>
        new java.io.File(f.stripPrefix("file:")).length()).sum
      math.round(bytes / 1e5) / 10.0
    }

    val keys = Seq("pk")
    val groups = Seq("grp")
    val aggs = Seq(AggSpec("price_c", "sum", "rev_c"),
      AggSpec("price_c", "count", "n"),
      AggSpec("price_c", "min", "min_c"), AggSpec("price_c", "max", "max_c"))

    val scales = Seq(("1x", base), ("10x", "/tmp/sfx10"), ("100x", "/tmp/sfx100"))
      .filter { case (_, d) => new java.io.File(s"$d/lineitem.parquet").exists() }
    val out = scales.map { case (label, d) =>
      val li = graft.sources.Tables.load(spark, d, "lineitem")
        .select(pmod(col("l_partkey"), lit(20000L)).as("pk"),
          col("l_orderkey"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"))
      val dim = spark.range(20000).select(col("id").as("pk"),
        concat(lit("G"), pmod(col("id"), lit(40))).as("grp"))
      val nFacts = li.count()

      // materialize EVERYTHING the refresh is allowed to touch — state
      // and delta arrive as files, like a real view between loads
      val tmp = java.nio.file.Files.createTempDirectory("ivmprof").toString
      val jv = IncrementalAgg.buildJoinView(
        li.filter(col("l_orderkey") % 100 =!= 0).select("pk", "price_c"),
        dim, keys, groups, aggs)
      jv.keyAgg.write.parquet(s"$tmp/keyagg")
      jv.view.write.parquet(s"$tmp/view")
      dim.write.parquet(s"$tmp/dim")
      li.filter(col("l_orderkey") % 100 === 0).select("pk", "price_c")
        .write.parquet(s"$tmp/delta")
      li.write.parquet(s"$tmp/facts") // the recompute's input, same files
      val stored = IncrementalAgg.JoinView(
        spark.read.parquet(s"$tmp/keyagg"), spark.read.parquet(s"$tmp/dim"),
        spark.read.parquet(s"$tmp/view"))
      val changes = spark.read.parquet(s"$tmp/dim")
        .filter(col("pk") % 100 === 0)
        .select(col("pk"), lit("MOVED").as("grp"), lit("U").as("op"))

      val refreshed = IncrementalAgg.refreshJoinView(stored,
        spark.read.parquet(s"$tmp/delta"), changes, keys, groups, aggs)
      val refreshMb = factsMb(refreshed.view)
      val (viewRows, refreshSec) = measured(refreshed.view.count())
      val dimNew = dim.filter(!(col("pk") % 100 === 0))
        .unionByName(dim.filter(col("pk") % 100 === 0)
          .select(col("pk"), lit("MOVED").as("grp")))
      val recomputed = IncrementalAgg.buildJoinView(
        spark.read.parquet(s"$tmp/facts").select("pk", "price_c"),
        dimNew, keys, groups, aggs)
      val fullMb = factsMb(recomputed.view)
      val (fullRows, fullSec) = measured(recomputed.view.count())
      require(viewRows == fullRows, s"refresh/recompute row mismatch at $label")

      // the RETRACTABLE path (inc5): counting state over ALL facts,
      // the same 1% of facts arrives as −1 signed deletes + the same
      // dim churn — same no-rescan claim, same flat-cost claim
      val cAggs = Seq(AggSpec("price_c", "sum", "rev_c"),
        AggSpec("price_c", "count", "n"))
      val rjv0 = IncrementalAgg.buildRetractableJoinView(
        spark.read.parquet(s"$tmp/facts").select("pk", "price_c"),
        dim, keys, groups, cAggs)
      rjv0.keyAgg.write.parquet(s"$tmp/rkeyagg")
      rjv0.view.write.parquet(s"$tmp/rview")
      val rstored = IncrementalAgg.JoinView(
        spark.read.parquet(s"$tmp/rkeyagg"), spark.read.parquet(s"$tmp/dim"),
        spark.read.parquet(s"$tmp/rview"))
      val rrefreshed = IncrementalAgg.refreshRetractableJoinView(rstored,
        spark.read.parquet(s"$tmp/delta").withColumn("_sign", lit(-1L)),
        changes, keys, groups, cAggs)
      val rMb = factsMb(rrefreshed.view)
      val (rRows, rSec) = measured(rrefreshed.view.count())
      val rRecomputed = IncrementalAgg.buildRetractableJoinView(
        spark.read.parquet(s"$tmp/facts")
          .filter(col("l_orderkey") % 100 =!= 0).select("pk", "price_c"),
        dimNew, keys, groups, cAggs)
      val (rFullRows, rFullSec) = measured(rRecomputed.view.count())
      require(rRows == rFullRows,
        s"retractable refresh/recompute row mismatch at $label")

      s"""{"scale":"$label","facts":$nFacts,"view_rows":$viewRows,""" +
        s""""refresh_sec":$refreshSec,"refresh_facts_mb":$refreshMb,""" +
        s""""recompute_sec":$fullSec,"recompute_facts_mb":$fullMb,""" +
        s""""retract_refresh_sec":$rSec,"retract_refresh_facts_mb":$rMb,""" +
        s""""retract_recompute_sec":$rFullSec}"""
    }
    val json = s"""{"metric":"ivm_scaling",""" +
      s""""shape":"20k-key dim, 1% fact delta + 1% dim churn, state and delta from parquet",""" +
      s""""scales":[${out.mkString(",")}]}"""
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/root/repo/IVM_MEASURE.json"), json + "\n")
    spark.stop()
  }
}
