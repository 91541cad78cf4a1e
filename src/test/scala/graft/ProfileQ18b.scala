package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** q18 piece timings at the 100x replica: where do the ~2s go?
  * Test/runMain graft.ProfileQ18b [sfDir]
  */
object ProfileQ18b {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sfx100"
    val spark = Bench.session(dir)
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[q18b] $name%-24s min=${ts.min}%.2fs runs=${ts.map(x => f"$x%.2f").mkString(",")}")
    }
    val l = graft.sources.Tables.load(spark, dir, "lineitem")
    val o = graft.sources.Tables.load(spark, dir, "orders")
    time("scan_lineitem_2col") {
      l.select("l_orderkey", "l_quantity").agg(sum("l_quantity")).count()
    }
    time("agg_only") {
      l.groupBy("l_orderkey").agg(sum(col("l_quantity").cast(LongType)).as("t"))
        .filter(col("t") > 150).count()
    }
    time("scan_orders") {
      o.select("o_orderkey", "o_custkey", "o_totalprice").agg(count(lit(1))).count()
    }
    time("q18_full") {
      SparkEntry.queries("q18_big_orders")(spark, dir).count()
    }
    spark.stop()
  }
}
