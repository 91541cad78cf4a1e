package graft

import org.apache.spark.metrics.source.CodegenMetrics

/** Decompose the per-action floor (guide §1): QueryPlanningTracker
  * phases + Janino compile counts for a trivial aggregate, q1 and dd2,
  * all WARM — names how much of each warm execution is planning vs
  * codegen re-compilation vs execution.
  *
  *   Test/runMain graft.ProfileActionFloor [sfDir]
  */
object ProfileActionFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def compileCount(): Long = CodegenMetrics.METRIC_SOURCE_CODE_SIZE.getCount

    def probe(name: String, mk: () => org.apache.spark.sql.DataFrame): String = {
      mk().count(); mk().count() // warm
      val runs = Seq.fill(7) {
        val c0 = compileCount()
        val t0 = System.nanoTime()
        val agg = mk().groupBy().count()
        agg.collect()
        val wall = (System.nanoTime() - t0) / 1e9
        val ph = agg.queryExecution.tracker.phases.map { case (k, v) =>
          k -> (v.endTimeMs - v.startTimeMs)
        }.toMap
        (wall, ph, compileCount() - c0)
      }
      val best = runs.minBy(_._1)
      val phj = best._2.map { case (k, v) => s""""$k":$v""" }.mkString(",")
      f""""$name":{"wall_sec":${best._1}%.4f,$phj,"codegen_compiles":${best._3},"compiles_all_runs":[${runs.map(_._3).mkString(",")}]}"""
    }

    val trivial = probe("trivial", () => spark.range(100).agg(sum(col("id"))))
    val q1 = probe("q1", () => SparkEntry.queries("q1_pricing_summary")(spark, sfDir))
    val dd2 = probe("dd2", () => SparkEntry.queries("dd2_minhash_lsh")(spark, sfDir))
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(s"""{"metric":"action_floor","sf":"$sfDir",$trivial,$q1,$dd2}""")
    spark.stop()
    sys.exit(0)
  }
}
