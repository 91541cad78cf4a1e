package graft

/** Which Catalyst rules burn the per-action planning floor (guide §1,
  * VERDICT r17 item 4): run each bench query once warm, then dump
  * RuleExecutor's cumulative per-rule wall time, top N.
  *
  *   Test/runMain graft.ProfileRuleTime [sfDir]
  */
object ProfileRuleTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sfDir)
    spark.sparkContext.setLogLevel("ERROR")

    // warm everything once so codegen/JIT are paid
    SparkEntry.benchQueries.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"$n failed: $e") }
    }
    // reset stats, then measure exactly one warm execution per query
    org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
    val t0 = System.nanoTime()
    SparkEntry.benchQueries.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).count()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    val dump = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(f"suite_wall_sec=$wall%.3f")
    raw.println(dump.split('\n').take(60).mkString("\n"))
    spark.stop()
    sys.exit(0)
  }
}
