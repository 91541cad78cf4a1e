package graft

/** Stage-round floor: RDD 2-stage shuffle vs DataFrame 1-exchange vs
  * DataFrame execution of a PRE-PLANNED physical plan — separates
  * scheduler cost from SQL-layer per-action cost (guide §1).
  *
  *   Test/runMain graft.ProfileStageFloor
  */
object ProfileStageFloor {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("/root/testdata/sf0.1")
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    import org.apache.spark.sql.functions._

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(n: Int)(f: => Unit): Double = Seq.fill(n)(timed(f)).min

    // warm
    (1 to 5).foreach { _ =>
      sc.parallelize(1 to 1000, 32).map(x => (x % 7, 1)).reduceByKey(_ + _).count()
      spark.range(1000).groupBy((col("id") % 7).as("k")).count().count()
    }

    val rdd2stage = minOf(9) {
      sc.parallelize(1 to 1000, 32).map(x => (x % 7, 1)).reduceByKey(_ + _).count()
    }
    val df1ex = minOf(9) {
      spark.range(1000).groupBy((col("id") % 7).as("k")).count().count()
    }
    // pre-built Dataset, repeated execution of the SAME Dataset object —
    // re-executes the physical plan without re-analysis/optimization
    val ds = spark.range(1000).groupBy((col("id") % 7).as("k")).count()
    ds.count()
    val dfPrePlanned = minOf(9)(ds.count())
    // collect via the executedPlan's RDD directly (no new action planning)
    val qe = spark.range(1000).groupBy((col("id") % 7).as("k")).count()
    qe.collect()
    val dfReCollect = minOf(9)(qe.collect())

    val json =
      f"""{"metric":"stage_floor","rdd_2stage":$rdd2stage%.4f,"df_1ex_count":$df1ex%.4f,""" +
        f""""df_same_ds_count":$dfPrePlanned%.4f,"df_same_ds_collect":$dfReCollect%.4f}"""
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
    spark.stop()
    sys.exit(0)
  }
}
