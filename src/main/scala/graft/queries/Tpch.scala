package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** TPC-H-shaped subquery/predicate workloads (adapted to the driver
  * schema): EXISTS → semi join, scalar subquery → aggregate join,
  * disjunctive pushdown, count-distribution. These exercise the Catalyst
  * rewrites (subquery decorrelation, semi-join selection, OR predicate
  * pushdown) a SQL frontend relies on.
  */
object Tpch {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  def all: Seq[Q] = Seq(

    // Q4-shaped: EXISTS(lineitem shipped >60 days after order) → semi join
    Q("q4_order_priority",
      (s, dir) => {
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-07-01") &&
            col("o_orderdate") < lit("1997-01-01"))
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"))
        val late = o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate").cast(DateType) >
              date_add(o("o_orderdate").cast(DateType), 60),
          "left_semi")
        late.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(asc_nulls_first("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS cnt
             |FROM orders
             |WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1997-01-01'
             |  AND EXISTS (
             |   SELECT 1 FROM lineitem
             |   WHERE l_orderkey = o_orderkey
             |     AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 60)
             |GROUP BY o_orderpriority
             |ORDER BY o_orderpriority NULLS FIRST""".stripMargin)),

    // Q13-shaped: order-count distribution per customer (left join keeps
    // zero-order customers)
    Q("q13_cust_distribution",
      (s, dir) => {
        val c = t(s, dir, "customer").select(col("c_custkey"))
        val o = t(s, dir, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT")
          .select(col("o_custkey"), col("o_orderkey"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy("c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc_nulls_last("custdist"), desc_nulls_last("c_count"))
      },
      Some("""SELECT c_count, COUNT(*) AS custdist FROM (
             | SELECT c_custkey, COUNT(o_orderkey) AS c_count
             | FROM customer LEFT JOIN orders
             |  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             | GROUP BY c_custkey)
             |GROUP BY c_count
             |ORDER BY custdist DESC NULLS LAST, c_count DESC NULLS LAST""".stripMargin)),

    // Q17-shaped: small-quantity orders vs 20% of the per-part average
    // (scalar subquery → aggregate + join)
    Q("q17_small_quantity",
      (s, dir) => {
        val p = t(s, dir, "part").filter(col("p_brand") === "Brand#23")
          .select("p_partkey")
        val l = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        val avgQ = l.groupBy(col("l_partkey").as("a_partkey"))
          .agg(avg("l_quantity").as("avg_qty"))
        val j = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .join(avgQ, l("l_partkey") === avgQ("a_partkey"))
          .filter(col("l_quantity") < col("avg_qty") * 0.2)
        j.agg((sum(cents(col("l_extendedprice"))) / 7).cast(LongType).as("avg_yearly_c"),
          count(lit(1)).as("cnt"))
      },
      Some("""SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) / 7 AS BIGINT)
             |  AS avg_yearly_c, COUNT(*) AS cnt
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand = 'Brand#23'
             |  AND l_quantity < (
             |   SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
             |   WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin)),

    // Q19-shaped: disjunction of conjunctive ranges (OR pushdown)
    Q("q19_disjunctive",
      (s, dir) => {
        val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
        val l = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        val j = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) &&
              col("l_quantity").between(20, 30)))
        j.agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .as("revenue_c"), count(lit(1)).as("cnt"))
      },
      Some("""SELECT SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT))
             |  AS revenue_c, COUNT(*) AS cnt
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             |       AND l_quantity BETWEEN 1 AND 11)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             |       AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
             |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin),
      bench = true)
  )
}
