package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.sources.Tables

/** Component timing for the registered q18 shape at a replica dir
  * (Test/runMain). Separates the clustered-aggregate cost, the gated
  * materialization, and the orders join, so bench time is attributable.
  */
object ProfileQ18Parts {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sfx100"
    val spark = Bench.session(dir)
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q18p] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val l = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
    t("isKeyClustered(first)") {
      println("  clustered=" + graft.operators.ClusteredAgg.isKeyClustered(l, "l_orderkey"))
    }
    def bigRaw = graft.operators.ClusteredAgg.groupByClustered(l, "l_orderkey",
      Seq(sum(col("l_quantity").cast(LongType)).as("total_qty")))
      .filter(col("total_qty") > 150)
    t("agg_count(cold)") { println("  big rows=" + bigRaw.count()) }
    t("agg_count(warm)") { bigRaw.count() }
    t("agg_count(warm2)") { bigRaw.count() }
    def big = graft.operators.Broadcasts.gated(bigRaw)
    t("gated(first=materialize)") { big.count() }
    t("gated(cached)") { big.count() }
    val o = Tables.load(spark, dir, "orders")
    t("orders_scan_count") {
      o.select("o_custkey", "o_orderkey", "o_totalprice").count()
    }
    def full = {
      val b = big
      o.join(b, o("o_orderkey") === b("l_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("total_c"),
          col("total_qty"))
        .orderBy(desc_nulls_last("total_qty"), asc_nulls_first("o_orderkey"))
        .limit(100)
    }
    (1 to 3).foreach(i => t(s"full_query_$i") { full.count() })
    spark.stop()
  }
}
