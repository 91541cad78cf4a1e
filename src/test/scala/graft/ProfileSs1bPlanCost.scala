package graft

/** Split ss1b's warm per-execution residual into construction /
  * first-action (planning+exec) / repeat-action (exec only, plan
  * cached on the Dataset) — names where the non-job driver constant
  * actually lives (guide §1).
  *
  *   Test/runMain graft.ProfileSs1bPlanCost [sfDir]
  */
object ProfileSs1bPlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    def q() = SparkEntry.queries("ss1b_cosine_topk_indexed")(spark, sfDir)

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(n: Int)(f: => Unit): Double = Seq.fill(n)(timed(f)).min

    q().count(); q().count() // warmup

    val whole = minOf(7)(q().count())
    val construct = minOf(7)(q())
    val df = q()
    df.count()
    val repeat = minOf(7)(df.count())     // plan cached on the Dataset
    // count() builds a NEW Dataset each time over a fresh frame; time
    // the collect() of a pre-built aggregate for the pure re-plan delta
    val agg = q().groupBy().count()
    agg.collect()
    val repeatAgg = minOf(7)(agg.collect())
    val json =
      f"""{"metric":"ss1b_plan_cost","sf":"$sfDir","warm_whole_sec":$whole%.4f,""" +
        f""""construct_sec":$construct%.4f,"repeat_count_same_df_sec":$repeat%.4f,""" +
        f""""repeat_collect_prebuilt_agg_sec":$repeatAgg%.4f}"""
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
    spark.stop()
    sys.exit(0)
  }
}
