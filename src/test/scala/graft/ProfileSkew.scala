package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scratch: skewed-join strategies head-to-head (Test/runMain).
  * Probe: 5M rows, 50% on one hot key; build: 100k distinct keys.
  */
object ProfileSkew {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // force the shuffle path — broadcast would hide the skew entirely
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    val probe = spark.range(5000000L).select(
      when(col("id") % 2 === 0, 0L)
        .otherwise(pmod(col("id"), lit(100000L))).as("k"),
      col("id").as("payload")).cache()
    val build = spark.range(100000L).select(
      col("id").as("k"), (col("id") * 7L).as("v")).cache()
    println("probe: " + probe.count() + " build: " + build.count())

    def time(name: String)(f: => Long): Unit = {
      f // warm
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name: ${times.map(_._1).min}%.2f s (rows=${times.head._2})")
    }

    time("plain shuffle join, AQE skew split") {
      probe.join(build, Seq("k")).count()
    }
    time("salted join (salt=32)") {
      Skew.saltedJoin(probe, build, Seq("k"), salt = 32).count()
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    time("plain shuffle join, AQE skew split OFF") {
      probe.join(build, Seq("k")).count()
    }
    spark.stop()
  }
}
