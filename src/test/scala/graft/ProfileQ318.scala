package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Plan-variant shootout for q3/q18 at the 100x replica — the two
  * headliners still >2x DuckDB at 60M rows (r4 verdict). Times each
  * candidate plan under the exact bench session. Test/runMain, args:
  * [sfDir] (default /tmp/sfx100).
  */
object ProfileQ318 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    sources.Tables.load(s, dir, name)
  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  def q3Current(s: SparkSession, dir: String): DataFrame =
    SparkEntry.queries("q3_shipping_priority")(s, dir)

  /** pre-aggregate lineitem revenue per orderkey BEFORE the orders join:
    * the shuffle carries one (key, long) row per orderkey instead of the
    * full filtered lineitem, and the orders side joins an already-final
    * aggregate (orderkey is unique in orders, so grouping by it alone is
    * equivalent to the (key, date) group).
    */
  def q3PreAgg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1996-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val lagg = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-03-15"))
      .groupBy("l_orderkey")
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(lagg, lagg("l_orderkey") === o("o_orderkey"))
      .select(o("o_orderkey").as("o_orderkey"), o("o_orderdate").as("o_orderdate"),
        col("revenue_c"))
      .orderBy(desc_nulls_last("revenue_c"), asc_nulls_first("o_orderkey"))
      .limit(10)
  }

  /** broadcast the (orders x customer) side into the lineitem scan — no
    * lineitem shuffle at all; agg after the broadcast join.
    */
  def q3BcastOrders(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1996-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val oc = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "o_orderdate")
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-03-15"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    l.join(broadcast(oc), l("l_orderkey") === oc("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
      .orderBy(desc_nulls_last("revenue_c"), asc_nulls_first("o_orderkey"))
      .limit(10)
  }

  /** pre-agg + broadcast the orders side: the only shuffle is the
    * lineitem aggregate's own exchange.
    */
  def q3PreAggBcast(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1996-03-15"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val oc = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select("o_orderkey", "o_orderdate")
    val lagg = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1996-03-15"))
      .groupBy("l_orderkey")
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
    lagg.join(broadcast(oc), lagg("l_orderkey") === oc("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("revenue_c"))
      .orderBy(desc_nulls_last("revenue_c"), asc_nulls_first("o_orderkey"))
      .limit(10)
  }

  def q18Current(s: SparkSession, dir: String): DataFrame =
    SparkEntry.queries("q18_big_orders")(s, dir)

  /** explicit broadcast of the filtered aggregate: AQE would convert the
    * join anyway, but only AFTER the orders-side shuffle write is already
    * running — the hint skips that 15M-row shuffle write entirely.
    */
  def q18BcastBig(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem").groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast(LongType)).as("total_qty"))
      .filter(col("total_qty") > 150)
    val o = t(s, dir, "orders")
    o.join(broadcast(big), o("o_orderkey") === big("l_orderkey"))
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("total_c"), col("total_qty"))
      .orderBy(desc_nulls_last("total_qty"), asc_nulls_first("o_orderkey"))
      .limit(100)
  }

  /** clustered-layout aggregate: per-partition finalization for keys whose
    * range is unique to one scan partition (no shuffle), HAVING pushed in.
    */
  def q18Clustered(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
    val big = graft.operators.Broadcasts.gated(
      graft.operators.ClusteredAgg.groupByClustered(l, "l_orderkey",
        Seq(sum(col("l_quantity").cast(LongType)).as("total_qty")))
        .filter(col("total_qty") > 150))
    val o = t(s, dir, "orders")
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .select(col("o_custkey"), col("o_orderkey"),
        cents(col("o_totalprice")).as("total_c"), col("total_qty"))
      .orderBy(desc_nulls_last("total_qty"), asc_nulls_first("o_orderkey"))
      .limit(100)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sfx100"
    val spark = Bench.session(dir)
    val variants: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "q3_gated" -> ((s: SparkSession, d: String) => SparkEntry.queries("q3_shipping_priority")(s, d)),
      "q18_current" -> q18Current _,
      "q18_clustered" -> q18Clustered _)
    variants.foreach { case (name, fn) =>
      fn(spark, dir).count() // warm
      val times = Seq.fill(3) {
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[q318] $name%-18s min=${times.min}%.2fs  runs=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
