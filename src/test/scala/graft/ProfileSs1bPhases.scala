package graft

/** Per-phase planning cost of one warm ss1b execution, from Spark's own
  * QueryPlanningTracker: analysis / optimization / physical planning,
  * plus wall total — names the driver constant's composition.
  *
  *   Test/runMain graft.ProfileSs1bPhases [sfDir]
  */
object ProfileSs1bPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sfDir)
    spark.sparkContext.setLogLevel("ERROR")
    def q() = SparkEntry.queries("ss1b_cosine_topk_indexed")(spark, sfDir)
    q().count(); q().count() // warm

    def phases(): (Map[String, Long], Double) = {
      val t0 = System.nanoTime()
      val agg = q().groupBy().count()
      agg.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val ph = agg.queryExecution.tracker.phases.map { case (k, v) =>
        k -> (v.endTimeMs - v.startTimeMs)
      }
      (ph.toMap, wall)
    }
    val results = Seq.fill(7)(phases())
    val best = results.minBy(_._2)
    val json = best._1.map { case (k, ms) => s""""$k":$ms""" }
      .mkString("{", ",", s""","wall_sec":${math.round(best._2 * 1000) / 1000.0}}""")
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(s"""{"metric":"ss1b_phases","sf":"$sfDir","phases_ms":$json}""")
    spark.stop()
    sys.exit(0)
  }
}
