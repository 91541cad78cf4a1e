package graft

import org.apache.spark.sql.SparkSession

/** Compare headline latency with AQE on vs off (Test/runMain). */
object ProfileAqe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    def run(aqe: Boolean): Unit = {
      val spark = GraftSession.builder("local[32]", 32)
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      val names = Seq("q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
        "q18_big_orders", "q19_disjunctive")
      val times = names.map { n =>
        SparkEntry.queries(n)(spark, dir).count() // warm
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"aqe=$aqe total=${times.sum}%.2f " +
        names.zip(times).map { case (n, t) => f"$n=$t%.2f" }.mkString(" "))
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
    run(aqe = true)
    run(aqe = false)
  }
}
