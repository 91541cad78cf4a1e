package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Decompose q5's warm cost at a bench replica: 4-column fact scan
  * alone, broadcast build alone (1-row probe side), and the full bare
  * plan — so the remaining DuckDB gap is attributed to a PART, not
  * guessed. Also times a variant that packs (orderkey, nationkey) into
  * one long and probes it as a LEFT SEMI after the supplier join — a
  * denser, payload-free relation.
  *
  *   Test/runMain graft.ProfileQ5Parts2 [sfDir]   (default /tmp/bsx1000)
  */
object ProfileQ5Parts2 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    sources.Tables.load(s, dir, name)
  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast(LongType)

  private def ocSide(s: SparkSession, dir: String): graft.operators.Broadcasts.Gated = {
    val asiaKeys = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("_asia_nk"))
    val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(asiaKeys),
        col("c_nationkey") === col("_asia_nk"), "left_semi")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select("o_orderkey", "o_custkey")
    graft.operators.Broadcasts.gatedStats(
      o.join(broadcast(c), c("c_custkey") === o("o_custkey"))
        .select("o_orderkey", "c_nationkey"))
  }

  /** Packed-semi variant: supplier join FIRST (adds s_nationkey), then
    * one LEFT SEMI probe of key' = orderkey*32 + nationkey against a
    * single-column packed relation (orderkey unique in orders → pack is
    * injective per lineitem row).
    */
  def packedSemi(s: SparkSession, dir: String): DataFrame = {
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val ocG = ocSide(s, dir)
    val packed = ocG.df.select(
      (col("o_orderkey") * 32 + col("c_nationkey")).as("_pk"))
    val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val l = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    l.join(broadcast(su), su("s_suppkey") === l("l_suppkey"))
      .join(broadcast(packed),
        col("_pk") === l("l_orderkey") * 32 + col("s_nationkey"),
        "left_semi")
      .join(broadcast(n), n("n_nationkey") === col("s_nationkey"))
      .join(broadcast(r), r("r_regionkey") === n("n_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
      .orderBy(desc_nulls_last("revenue_c"), asc_nulls_first("n_name"))
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/bsx1000"
    val spark = Bench.session(dir)
    spark.sparkContext.setLogLevel("ERROR")
    val ocG = ocSide(spark, dir)
    println(s"[q5parts] oc rows=${ocG.rows} broadcasted=${ocG.broadcasted}")
    val l = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val variants: Seq[(String, () => Long)] = Seq(
      "scan4_only" -> (() => l.agg(sum(cents(col("l_extendedprice") *
          (lit(1) - col("l_discount")))), sum(col("l_orderkey")),
          sum(col("l_suppkey"))).count()),
      "build_only" -> (() => spark.range(1).toDF("l_orderkey")
        .join(ocG.df, col("o_orderkey") === col("l_orderkey")).count()),
      "scan_plus_probe" -> (() => l.join(ocG.df,
        col("o_orderkey") === col("l_orderkey")).groupBy()
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))).count()),
      "q5_bare_full" -> (() => SparkEntry.queries("q5_local_supplier")(spark, dir).count()),
      "q5_packed_semi" -> (() => packedSemi(spark, dir).count()))
    variants.foreach { case (name, fn) => fn(); () } // warmups
    variants.foreach { case (name, fn) =>
      val times = Seq.fill(3) {
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }
      println(f"[q5parts] $name%-16s min=${times.min}%.2fs runs=${times.map(x => f"$x%.2f").mkString(",")}")
    }
    // the packed variant must agree with the registry row
    val want = SparkEntry.queries("q5_local_supplier")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val got = packedSemi(spark, dir).collect().map(_.toSeq).toSeq
    println(s"[q5parts] packed==bare: ${got == want}")
    spark.stop()
  }
}
