package graft

/** The per-job / per-stage / per-task floor of this host+session (guide
  * §1): times trivial jobs of various shapes so query-level numbers can
  * be decomposed into harness floor vs real work.
  *
  *   Test/runMain graft.ProfileJobFloor
  */
object ProfileJobFloor {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("/root/testdata/sf0.1")
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    import spark.implicits._

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def minOf(n: Int)(f: => Unit): Double = Seq.fill(n)(timed(f)).min

    // warmups
    (1 to 5).foreach { _ =>
      sc.parallelize(1 to 32, 32).count()
      spark.range(1000).groupBy(($"id" % 7).as("k")).count().count()
    }

    val rdd1 = minOf(9)(sc.parallelize(Seq(1), 1).count())
    val rdd32 = minOf(9)(sc.parallelize(1 to 32, 32).count())
    val rdd256 = minOf(9)(sc.parallelize(1 to 256, 256).count())
    // DataFrame single-stage (no exchange) action
    val df0 = minOf(9)(spark.range(100).agg(org.apache.spark.sql.functions.sum($"id")).collect())
    // DataFrame one-exchange action (AQE: 2 stages)
    val df1 = minOf(9)(spark.range(1000).groupBy(($"id" % 7).as("k")).count().count())
    // DataFrame two-exchange action (AQE: 3 stages)
    val df2 = minOf(9)(spark.range(1000).groupBy(($"id" % 7).as("k")).count()
      .groupBy(($"k" % 3).as("j")).count().count())
    // same two-exchange with AQE off
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val df2off = minOf(9)(spark.range(1000).groupBy(($"id" % 7).as("k")).count()
      .groupBy(($"k" % 3).as("j")).count().count())
    val df1off = minOf(9)(spark.range(1000).groupBy(($"id" % 7).as("k")).count().count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // localCheckpoint of a trivial frame
    val ckpt = minOf(9)(spark.range(1000).toDF("id").localCheckpoint(true))

    val json =
      f"""{"metric":"job_floor","rdd_1task":$rdd1%.4f,"rdd_32task":$rdd32%.4f,""" +
        f""""rdd_256task":$rdd256%.4f,"df_0ex":$df0%.4f,"df_1ex":$df1%.4f,""" +
        f""""df_2ex":$df2%.4f,"df_1ex_aqeoff":$df1off%.4f,"df_2ex_aqeoff":$df2off%.4f,""" +
        f""""ckpt_trivial":$ckpt%.4f}"""
    val raw = new java.io.PrintStream(
      new java.io.FileOutputStream(java.io.FileDescriptor.out), true)
    raw.println(json)
    spark.stop()
    sys.exit(0)
  }
}
