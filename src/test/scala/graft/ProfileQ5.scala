package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** q5 plan-variant shootout at the 100x replica — after the r6 q3/q18
  * fixes, q5 is the weakest headliner (1.46x DuckDB at 60M rows). Its
  * cost is the orders⋈lineitem shuffle join (both sides large). The
  * candidate: broadcast the (filtered orders × customer) side into the
  * lineitem scan — the q3 shape — so the 60M-row side never shuffles.
  *
  *   Test/runMain graft.ProfileQ5 [sfDir]   (default /tmp/sfx100)
  */
object ProfileQ5 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    sources.Tables.load(s, dir, name)
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast(LongType)

  def current(s: SparkSession, dir: String): DataFrame =
    SparkEntry.queries("q5_local_supplier")(s, dir)

  /** (orders ⋈ bcast customer) reduced to (o_orderkey, c_nationkey),
    * gated-broadcast into lineitem; supplier/nation/region broadcast as
    * before. The only remaining exchange is the final 5-row aggregate's.
    */
  def bcastOC(s: SparkSession, dir: String, gateMb: Int = 256): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    val oc = graft.operators.Broadcasts.gated(
      o.join(broadcast(c), c("c_custkey") === o("o_custkey"))
        .select("o_orderkey", "c_nationkey"),
      maxBytes = gateMb.toLong << 20)
    val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val l = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(oc, oc("o_orderkey") === l("l_orderkey"))
      .join(broadcast(su),
        su("s_suppkey") === l("l_suppkey") && su("s_nationkey") === col("c_nationkey"))
      .join(broadcast(n), n("n_nationkey") === su("s_nationkey"))
      .join(broadcast(r), r("r_regionkey") === n("n_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
      .orderBy(desc_nulls_last("revenue_c"), asc_nulls_first("n_name"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sfx100"
    val spark = Bench.session(dir)
    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q5_current" -> current _,
      "q5_bcast_oc" -> ((s: SparkSession, d: String) => bcastOC(s, d)))
    variants.foreach { case (name, fn) =>
      val rows = fn(spark, dir).collect()
      println(s"[q5] $name rows=${rows.length} head=${rows.headOption}")
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q5] $name%-14s min=${times.min}%.2fs  runs=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
