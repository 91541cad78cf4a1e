package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Broadcasts, LookupJoin, RuntimeFilters}
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
        // integer floor division on both sides (Spark double->long cast
        // truncates but DuckDB's CAST rounds — `div` vs `//` agree)
        j.agg(expr("sum(cast(round(l_extendedprice*100) as bigint)) div 7").as("avg_yearly_c"),
          count(lit(1)).as("cnt"))
      },
      Some("""SELECT CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) // 7
             |  AS avg_yearly_c, COUNT(*) AS cnt
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE p_brand = 'Brand#23'
             |  AND l_quantity < (
             |   SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
             |   WHERE l2.l_partkey = lineitem.l_partkey)""".stripMargin)),

    // Q7-shaped: volume between two nations by year (dual-direction pair
    // filter over supplier-nation × customer-nation). r18 (§3.1/§2.3,
    // second consumer of the q5/q10 lookup pattern): both reduced sides
    // are unique-long-key single-attribute dimensions pre-filtered to
    // the 3 named nations — (orders⋈customer)→(o_orderkey→c_nationkey,
    // ~12% of orders) and supplier→(s_suppkey→s_nationkey, ~12%) — so
    // the fact probes two cached lookup tables in its scan filter and
    // ~98% of lineitem rows drop at the probes, where the old shape
    // SMJ-shuffled ALL of lineitem against ALL of orders and filtered
    // the nation pair only after attachment. The 600M-row aggregate
    // groups on the BARE key pair + year; names attach to the ≤ 3·3·7-
    // row partial and re-aggregate BY NAME with the name-inequality
    // re-applied, so the declared GROUP-BY-name semantics hold even
    // under duplicate names. Past the pin budget the old shape runs.
    Q("q7_volume_shipping",
      (s, dir) => {
        val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
        val n1 = t(s, dir, "nation").select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
        val n2 = t(s, dir, "nation").select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
        val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
        val l = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"),
            year(col("l_shipdate")).cast(LongType).as("l_year"))
        val pairNations = Seq("NATION_1", "NATION_2", "NATION_3")
        val nKeys = t(s, dir, "nation")
          .filter(col("n_name").isin(pairNations: _*))
          .select(col("n_nationkey").as("_pair_nk"))
        val cP = c.join(broadcast(nKeys),
          col("c_nationkey") === col("_pair_nk"), "left_semi")
        val suP = su.join(broadcast(nKeys),
          col("s_nationkey") === col("_pair_nk"), "left_semi")
        val ocG = Broadcasts.gatedStats(
          o.join(broadcast(cP), cP("c_custkey") === o("o_custkey"))
            .select("o_orderkey", "c_nationkey"))
        val suG = Broadcasts.gatedStats(suP)
        if (ocG.broadcasted && suG.broadcasted) {
          val lj = LookupJoin.inner(l, col("l_orderkey"), ocG.bare,
            "o_orderkey", "c_nationkey", "_cnk")
          LookupJoin.inner(lj, col("l_suppkey"), suG.bare,
              "s_suppkey", "s_nationkey", "_snk")
            .filter(col("_snk") =!= col("_cnk"))
            .groupBy(col("_snk"), col("_cnk"), col("l_year"))
            .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("_rev_part"))
            .join(broadcast(n1), col("sn_key") === col("_snk"))
            .join(broadcast(n2), col("cn_key") === col("_cnk"))
            .filter(col("supp_nation") =!= col("cust_nation"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(sum(col("_rev_part")).as("revenue_c"))
            .orderBy("supp_nation", "cust_nation", "l_year")
        } else {
          val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
            .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
            .join(broadcast(c), o("o_custkey") === c("c_custkey"))
            .join(broadcast(n1), su("s_nationkey") === n1("sn_key"))
            .join(broadcast(n2), c("c_nationkey") === n2("cn_key"))
            .filter(
              col("supp_nation").isin(pairNations: _*) &&
              col("cust_nation").isin(pairNations: _*) &&
              col("supp_nation") =!= col("cust_nation"))
          j.groupBy("supp_nation", "cust_nation", "l_year")
            .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_c"))
            .orderBy("supp_nation", "cust_nation", "l_year")
        }
      },
      Some("""SELECT supp_nation, cust_nation, l_year,
             | CAST(SUM(CAST(ROUND(volume*100) AS BIGINT)) AS BIGINT) AS revenue_c
             |FROM (
             | SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
             |  l_extendedprice * (1 - l_discount) AS volume
             | FROM supplier, lineitem, orders, customer, nation n1, nation n2
             | WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
             |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
             |  AND c_nationkey = n2.n_nationkey
             |  AND n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
             |  AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
             |  AND n1.n_name <> n2.n_name)
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // Q9-shaped: profit by supplier nation × year, parts filtered by type
    Q("q9_product_profit",
      (s, dir) => {
        val p = t(s, dir, "part").filter(col("p_type") === "PROMO").select("p_partkey")
        val su = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
        val n = t(s, dir, "nation").select("n_nationkey", "n_name")
        val l = t(s, dir, "lineitem")
        val j = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
        j.groupBy(col("n_name").as("nation"),
          year(col("l_shipdate")).cast(LongType).as("o_year"))
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("profit_c"))
          .orderBy(asc_nulls_first("nation"), desc_nulls_last("o_year"))
      },
      Some("""SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
             | CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS profit_c
             |FROM lineitem, part, supplier, nation
             |WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
             |  AND s_nationkey = n_nationkey AND p_type = 'PROMO'
             |GROUP BY 1, 2
             |ORDER BY nation NULLS FIRST, o_year DESC NULLS LAST""".stripMargin)),

    // Q10-shaped: top customers by returned-item revenue. The string-
    // payload LookupJoin adoption (r17): both reduced sides are
    // unique-key dimensions — date-filtered orders (o_orderkey →
    // o_custkey) and customer⋈nation (c_custkey → c_name, n_name) — so
    // inside the pin budget the fact probes BOTH as cached lookup
    // tables instead of per-execution BroadcastHashJoin rebuilds. The
    // customer dim's two STRING attributes ride dictionary-encoded
    // (long code in the table + one broadcast pool per field): the
    // 600M-row hot path groups on the BARE custkey (names are
    // functionally dependent on it) behind an existence-only code
    // probe, and the strings decode on just the top-20 rows. Past
    // either gate the plan degrades to the shuffle join, Bloom-guarded.
    Q("q10_returned_items",
      (s, dir) => {
        val n = t(s, dir, "nation")
        val custDimG = Broadcasts.gatedStats(
          t(s, dir, "customer").select("c_custkey", "c_name", "c_nationkey")
            .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
            .select("c_custkey", "c_name", "n_name"))
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-10-01") &&
            col("o_orderdate") < lit("1997-01-01"))
          .select("o_orderkey", "o_custkey")
        val oG = Broadcasts.gatedStats(o)
        val l = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
          .select("l_orderkey", "l_extendedprice", "l_discount")
        val revenue =
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_c")
        if (oG.broadcasted && custDimG.broadcasted) {
          val pay = Seq("c_name", "n_name")
          LookupJoin.inner(l, col("l_orderkey"), oG.bare,
              "o_orderkey", "o_custkey", "_ck")
            .transform(lo => LookupJoin.semi(lo, col("_ck"),
              custDimG.bare, "c_custkey", pay))
            .groupBy(col("_ck").as("c_custkey"))
            .agg(revenue)
            .orderBy(desc_nulls_last("revenue_c"),
              asc_nulls_first("c_custkey"))
            .limit(20)
            .transform(top => LookupJoin.inner(top, col("c_custkey"),
              custDimG.bare, "c_custkey", pay.map(p => p -> p)))
            .select(col("c_custkey"), col("c_name"), col("n_name"),
              col("revenue_c"))
            .orderBy(desc_nulls_last("revenue_c"),
              asc_nulls_first("c_custkey"))
        } else {
          val lg = RuntimeFilters.shuffleGuard(l, "l_orderkey", oG,
            "o_orderkey")
          lg.join(oG.df, oG.df("o_orderkey") === lg("l_orderkey"))
            .join(custDimG.df, col("o_custkey") === col("c_custkey"))
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(revenue)
            .orderBy(desc_nulls_last("revenue_c"),
              asc_nulls_first("c_custkey"))
            .limit(20)
        }
      },
      Some("""SELECT c_custkey, c_name, n_name,
             | CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c
             |FROM customer, orders, lineitem, nation
             |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             |  AND o_orderdate >= '1996-10-01' AND o_orderdate < '1997-01-01'
             |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
             |GROUP BY 1, 2, 3
             |ORDER BY revenue_c DESC NULLS LAST, c_custkey NULLS FIRST
             |LIMIT 20""".stripMargin)),

    // Q14-shaped: promo revenue share (numerator/denominator kept exact)
    Q("q14_promo_share",
      (s, dir) => {
        val p = t(s, dir, "part").select("p_partkey", "p_type")
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-09-01") &&
            col("l_shipdate") < lit("1996-10-01"))
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .agg(
            sum(when(col("p_type") === "PROMO",
              cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
              .otherwise(0L)).as("promo_c"),
            sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("total_c"))
      },
      Some("""SELECT
             | CAST(SUM(CASE WHEN p_type = 'PROMO'
             |   THEN CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)
             |   ELSE 0 END) AS BIGINT) AS promo_c,
             | CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_c
             |FROM lineitem, part
             |WHERE l_partkey = p_partkey
             |  AND l_shipdate >= '1996-09-01' AND l_shipdate < '1996-10-01'""".stripMargin)),

    // Q15-shaped: top supplier(s) by revenue (scalar-subquery max)
    Q("q15_top_supplier",
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1996-04-01"))
          .groupBy(col("l_suppkey").as("supplier_no"))
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("total_rev_c"))
        // scalar subquery as a broadcast 1-row aggregate: one plan, one
        // job; an empty revenue window gives a NULL max, the equality
        // evaluates NULL, and the join yields no rows — same semantics
        // as the SQL scalar subquery with no driver round-trip
        val maxRev = rev.agg(max("total_rev_c").as("_max_rev_c"))
        val su = t(s, dir, "supplier")
        su.join(rev, su("s_suppkey") === rev("supplier_no"))
          .join(broadcast(maxRev), col("total_rev_c") === col("_max_rev_c"))
          .select("s_suppkey", "s_name", "total_rev_c")
          .orderBy("s_suppkey")
      },
      Some("""WITH revenue AS (
             | SELECT l_suppkey AS supplier_no,
             |  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_rev_c
             | FROM lineitem
             | WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
             | GROUP BY 1)
             |SELECT s_suppkey, s_name, total_rev_c
             |FROM supplier, revenue
             |WHERE s_suppkey = supplier_no
             |  AND total_rev_c = (SELECT MAX(total_rev_c) FROM revenue)
             |ORDER BY s_suppkey""".stripMargin)),

    // Q16-shaped: supplier counts per part attribute, excluding a brand
    Q("q16_parts_suppliers",
      (s, dir) => {
        val p = t(s, dir, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_size").isin(1, 5, 10, 15, 20))
          .select("p_partkey", "p_brand", "p_type", "p_size")
        val l = t(s, dir, "lineitem").select("l_partkey", "l_suppkey")
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .groupBy("p_brand", "p_type", "p_size")
          .agg(countDistinct("l_suppkey").as("supplier_cnt"))
          .orderBy(desc_nulls_last("supplier_cnt"), asc_nulls_first("p_brand"),
            asc_nulls_first("p_type"), asc_nulls_first("p_size"))
      },
      Some("""SELECT p_brand, p_type, p_size,
             | COUNT(DISTINCT l_suppkey) AS supplier_cnt
             |FROM lineitem, part
             |WHERE p_partkey = l_partkey AND p_brand <> 'Brand#5'
             |  AND p_size IN (1, 5, 10, 15, 20)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC NULLS LAST, p_brand NULLS FIRST,
             | p_type NULLS FIRST, p_size NULLS FIRST""".stripMargin)),

    // Q12-shaped: two-level conditional aggregation per derived ship mode
    Q("q12_shipmode",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01"))
          .select(col("l_orderkey"),
            element_at(array(lit("MAIL"), lit("SHIP"), lit("RAIL")),
              (col("l_linenumber") % 3 + 1).cast(IntegerType)).as("mode"))
        val o = t(s, dir, "orders").select("o_orderkey", "o_orderpriority")
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .groupBy("mode")
          .agg(
            sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("high_cnt"),
            sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L)).as("low_cnt"))
          .orderBy("mode")
      },
      Some("""SELECT mode,
             | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |   THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt,
             | CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |   THEN 1 ELSE 0 END) AS BIGINT) AS low_cnt
             |FROM (
             | SELECT l_orderkey,
             |  (['MAIL', 'SHIP', 'RAIL'])[l_linenumber % 3 + 1] AS mode
             | FROM lineitem
             | WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01') l
             |JOIN orders ON o_orderkey = l_orderkey
             |GROUP BY mode ORDER BY mode""".stripMargin)),

    // Q22-shaped: above-average-balance customers with no orders. The
    // average comparison is cross-multiplied into exact integers
    // (bal_c·n > Σbal_c) so no float summation order can flip a
    // boundary row in either engine.
    Q("q22_global_sales",
      (s, dir) => {
        val c = t(s, dir, "customer").select(
          col("c_custkey"), (col("c_nationkey") % 10).as("code"),
          cents(col("c_acctbal")).as("bal_c"))
        // global-agg scalar folded in as a broadcast 1-row cross join:
        // ungrouped agg always emits exactly one row (s NULL, n 0 on
        // empty input → comparison NULL → no rows), so this is the
        // scalar subquery in a single plan
        val pos = c.filter(col("bal_c") > 0)
          .agg(sum("bal_c").as("_s"), count(lit(1)).as("_n"))
        val o = t(s, dir, "orders").select(col("o_custkey"))
        c.crossJoin(broadcast(pos))
          .filter(col("bal_c") * col("_n") > col("_s"))
          .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .groupBy("code")
          .agg(count(lit(1)).as("cnt"), sum("bal_c").as("total_bal_c"))
          .orderBy("code")
      },
      Some("""WITH pos AS (
             | SELECT CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS s,
             |  COUNT(*) AS n
             | FROM customer WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) > 0)
             |SELECT c_nationkey % 10 AS code, COUNT(*) AS cnt,
             | CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS total_bal_c
             |FROM customer, pos
             |WHERE CAST(ROUND(c_acctbal*100) AS BIGINT) * n > s
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |GROUP BY 1 ORDER BY code""".stripMargin)),

    // Q8-shaped: national market share — revenue share of one supplier
    // nation within a region's market for a part type, by order year.
    // Share integerized as permille of exact cent sums.
    Q("q8_market_share",
      (s, dir) => {
        val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
        val n = t(s, dir, "nation")
        val custN = t(s, dir, "customer").join(
          broadcast(n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
            .select(col("n_nationkey").as("cn_key"))),
          col("c_nationkey") === col("cn_key"))
          .select("c_custkey")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01") &&
            col("o_orderdate") < lit("1998-01-01"))
          .join(custN, col("o_custkey") === custN("c_custkey"))
          .select(col("o_orderkey"), year(col("o_orderdate")).cast(LongType).as("o_year"))
        val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
          .select("p_partkey")
        val supN = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey"))
        val l = t(s, dir, "lineitem")
        l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
          .join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(supN), l("l_suppkey") === supN("s_suppkey"))
          .withColumn("rev_c", cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
          .groupBy("o_year")
          .agg(
            sum(when(col("s_nationkey") === 3, col("rev_c")).otherwise(0L)).as("nat_c"),
            sum(col("rev_c")).as("total_c"))
          .select(col("o_year"),
            // integral div on both sides: a double-division detour can
            // round up across an integer boundary before the truncation
            expr("CAST(nat_c * 1000 div total_c AS BIGINT)").as("share_pm"),
            col("nat_c"), col("total_c"))
          .orderBy("o_year")
      },
      Some("""SELECT o_year,
             | CAST(nat_c * 1000 // total_c AS BIGINT) AS share_pm,
             | nat_c, total_c
             |FROM (
             | SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             |  CAST(SUM(CASE WHEN s_nationkey = 3
             |    THEN CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)
             |    ELSE 0 END) AS BIGINT) AS nat_c,
             |  CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS total_c
             | FROM lineitem, orders, customer, nation, region, part, supplier
             | WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
             |   AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
             |   AND r_name = 'ASIA' AND l_partkey = p_partkey
             |   AND p_type = 'PROMO' AND l_suppkey = s_suppkey
             |   AND o_orderdate >= '1996-01-01' AND o_orderdate < '1998-01-01'
             | GROUP BY 1)
             |ORDER BY o_year""".stripMargin)),

    // Q11-shaped (no partsupp table → supply value from lineitem):
    // parts whose total supply value exceeds 0.1% of the global value —
    // the global scalar rides a broadcast 1-row cross join, one plan
    Q("q11_important_parts",
      (s, dir) => {
        val value = t(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("partkey"))
          .agg(sum(cents(col("l_extendedprice"))).as("value_c"))
        val total = value.agg(sum("value_c").as("_tot"))
        value.crossJoin(broadcast(total))
          .filter(col("value_c") * 1000L > col("_tot"))
          .select("partkey", "value_c")
          .orderBy(desc_nulls_last("value_c"), asc_nulls_first("partkey"))
      },
      Some("""WITH v AS (
             | SELECT l_partkey AS partkey,
             |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS value_c
             | FROM lineitem GROUP BY 1)
             |SELECT partkey, value_c FROM v
             |WHERE value_c * 1000 > (SELECT SUM(value_c) FROM v)
             |ORDER BY value_c DESC NULLS LAST, partkey NULLS FIRST""".stripMargin)),

    // Q21-shaped (schema has no receipt/commit dates): suppliers that
    // were the LAST to ship in multi-supplier orders — the double
    // correlated EXISTS / NOT EXISTS decorrelation pattern of Q21
    Q("q21_last_shipper",
      (s, dir) => {
        val l = t(s, dir, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_shipdate")
        val l1 = l.groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max("l_shipdate").as("ship"))
        // EXISTS another supplier in the order
        val other = l1.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"),
          col("ship").as("ship2"))
        val multi = l1.join(other,
          l1("l_orderkey") === other("o2") && l1("l_suppkey") =!= other("s2"),
          "left_semi")
        // NOT EXISTS another supplier shipping strictly later
        val later = l1.select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"),
          col("ship").as("ship3"))
        val lastOnes = multi.join(later,
          multi("l_orderkey") === later("o3") && multi("l_suppkey") =!= later("s3") &&
            later("ship3") > multi("ship"),
          "left_anti")
        lastOnes.join(t(s, dir, "supplier"),
          lastOnes("l_suppkey") === col("s_suppkey"))
          .groupBy("s_name")
          .agg(count(lit(1)).as("numwait"))
          .orderBy(desc_nulls_last("numwait"), asc_nulls_first("s_name"))
          .limit(20)
      },
      Some("""WITH l1 AS (
             | SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS ship
             | FROM lineitem GROUP BY 1, 2)
             |SELECT s_name, COUNT(*) AS numwait
             |FROM l1 JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE EXISTS (
             |  SELECT 1 FROM l1 l2 WHERE l2.l_orderkey = l1.l_orderkey
             |   AND l2.l_suppkey <> l1.l_suppkey)
             | AND NOT EXISTS (
             |  SELECT 1 FROM l1 l3 WHERE l3.l_orderkey = l1.l_orderkey
             |   AND l3.l_suppkey <> l1.l_suppkey AND l3.ship > l1.ship)
             |GROUP BY s_name
             |ORDER BY numwait DESC NULLS LAST, s_name NULLS FIRST
             |LIMIT 20""".stripMargin)),

    // Q2-shaped (no partsupp → per-(part,supplier) unit cost derived
    // from lineitem): for each PROMO part, the supplier(s) with the
    // minimum unit cost — the correlated per-group scalar (argmin)
    // decorrelation, distinct from q15's global max
    Q("q2_min_cost_supplier",
      (s, dir) => {
        val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
          .select("p_partkey")
        val costs = t(s, dir, "lineitem")
          .join(broadcast(p), col("l_partkey") === p("p_partkey"))
          .groupBy(col("l_partkey"), col("l_suppkey"))
          // unit cost in cents, integer div on exact cents/quantity sums
          .agg(expr("CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) div " +
            "SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)").as("unit_c"))
        val minCost = costs.groupBy(col("l_partkey").as("pk"))
          .agg(min("unit_c").as("min_c"))
        costs.join(minCost,
          costs("l_partkey") === minCost("pk") &&
            costs("unit_c") === minCost("min_c"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select(col("l_partkey").as("partkey"), col("s_suppkey"),
            col("s_name"), col("unit_c"))
          .orderBy("partkey", "s_suppkey")
      },
      Some("""WITH costs AS (
             | SELECT l_partkey, l_suppkey,
             |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) //
             |   SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS unit_c
             | FROM lineitem, part
             | WHERE l_partkey = p_partkey AND p_type = 'PROMO'
             | GROUP BY 1, 2)
             |SELECT c.l_partkey AS partkey, s_suppkey, s_name, unit_c
             |FROM costs c
             |JOIN supplier ON c.l_suppkey = s_suppkey
             |WHERE unit_c = (SELECT MIN(unit_c) FROM costs c2
             |                WHERE c2.l_partkey = c.l_partkey)
             |ORDER BY partkey, s_suppkey""".stripMargin)),

    // Q20-shaped (no partsupp → shipped quantities stand in for stock):
    // suppliers that shipped >30% of a PROMO part's 1996 volume — the
    // nested-aggregate (HAVING against a per-part total) decorrelation
    Q("q20_dominant_suppliers",
      (s, dir) => {
        val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
          .select("p_partkey")
        val l = t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01") &&
            col("l_shipdate") < lit("1997-01-01"))
          .join(broadcast(p), col("l_partkey") === p("p_partkey"))
          .select(col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast(LongType).as("qty"))
        val perSupp = l.groupBy("l_partkey", "l_suppkey")
          .agg(sum("qty").as("supp_qty"))
        val perPart = l.groupBy(col("l_partkey").as("pk"))
          .agg(sum("qty").as("part_qty"))
        perSupp.join(perPart, perSupp("l_partkey") === perPart("pk"))
          .filter(col("supp_qty") * 10L > col("part_qty") * 3L)
          .select(col("l_suppkey")).distinct()
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .select("s_suppkey", "s_name")
          .orderBy("s_suppkey")
      },
      Some("""WITH l AS (
             | SELECT l_partkey, l_suppkey, CAST(l_quantity AS BIGINT) AS qty
             | FROM lineitem, part
             | WHERE l_partkey = p_partkey AND p_type = 'PROMO'
             |   AND l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'),
             |per_supp AS (
             | SELECT l_partkey, l_suppkey, SUM(qty) AS supp_qty
             | FROM l GROUP BY 1, 2),
             |per_part AS (
             | SELECT l_partkey, SUM(qty) AS part_qty FROM l GROUP BY 1)
             |SELECT DISTINCT s_suppkey, s_name
             |FROM per_supp ps
             |JOIN per_part pp ON ps.l_partkey = pp.l_partkey
             |JOIN supplier ON ps.l_suppkey = s_suppkey
             |WHERE ps.supp_qty * 10 > pp.part_qty * 3
             |ORDER BY s_suppkey""".stripMargin)),

    // Q19-shaped: disjunction of conjunctive ranges (OR pushdown).
    // r17: the brand/size half of each disjunct depends only on the
    // part row, and the three brands are distinct, so every part folds
    // to ONE disjoint class id (1/2/3, NULL = can never match). Parts
    // of class NULL are dropped from the side BEFORE the join — the
    // side shrinks ~8× — and the survivor probes a cached LookupJoin
    // table instead of a BroadcastHashJoin whose forced-hint relation
    // (p_partkey, p_brand string, p_size) was rebuilt and re-broadcast
    // EVERY execution (guide §3.1/§2.3; at the 1000× replica the hint
    // shipped a 20M-row side per run). The fact-side filter keeps only
    // the per-class quantity range — same surviving rows, narrower
    // probe, no strings on the hot path. Past the pin budget the plan
    // degrades to the Bloom-guarded shuffle join.
    Q("q19_disjunctive",
      (s, dir) => {
        val p = t(s, dir, "part").select("p_partkey", "p_brand", "p_size")
        val cls =
          when(col("p_brand") === "Brand#12" && col("p_size").between(1, 15), 1L)
          .when(col("p_brand") === "Brand#23" && col("p_size").between(1, 25), 2L)
          .when(col("p_brand") === "Brand#34" && col("p_size").between(1, 35), 3L)
        val pcG = Broadcasts.gatedStats(
          p.select(col("p_partkey"), cls.as("_cls"))
            .filter(col("_cls").isNotNull))
        val l = t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        val j = if (pcG.broadcasted)
          LookupJoin.inner(l, col("l_partkey"), pcG.bare,
            "p_partkey", "_cls", "_cls")
        else {
          val lg = RuntimeFilters.shuffleGuard(l, "l_partkey", pcG,
            "p_partkey")
          lg.join(pcG.df, pcG.df("p_partkey") === lg("l_partkey"))
        }
        j.filter(
            (col("_cls") === 1 && col("l_quantity").between(1, 11)) ||
            (col("_cls") === 2 && col("l_quantity").between(10, 20)) ||
            (col("_cls") === 3 && col("l_quantity").between(20, 30)))
          .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_c"), count(lit(1)).as("cnt"))
      },
      Some("""SELECT CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
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
