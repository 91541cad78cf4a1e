package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{AsOf, Skew}
import graft.schema.SchemaDSL
import graft.sources.Tables

/** Advanced relational coverage: as-of joins, exact statistics, more
  * TPC-H-shaped analytics, schema-driven nested parsing.
  */
object Advanced {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  def all: Seq[Q] = Seq(

    // As-of join (union+window carry, AsOf.join) vs DuckDB's native ASOF
    Q("a1_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val left = ev.select(col("user_id"), col("ts"), col("event_id"))
        val right = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts").as("ets"), cents(col("value")).as("err_c"))
        AsOf.join(left, right, "user_id", "ts", "ets", "err_c")
          .select(col("event_id"), col("asof_err_c"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, r.err_c AS asof_err_c
             |FROM events l ASOF LEFT JOIN
             | (SELECT user_id, ts AS ets, CAST(ROUND(value*100) AS BIGINT) AS err_c
             |  FROM events WHERE event_type = 'error') r
             |ON l.user_id = r.user_id AND l.ts >= r.ets
             |ORDER BY l.event_id""".stripMargin)),

    // Forward as-of: earliest following error per user (DuckDB expresses
    // it as ASOF with the inequality flipped)
    Q("a10_asof_forward",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val left = ev.select(col("user_id"), col("ts"), col("event_id"))
        val right = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts").as("ets"), cents(col("value")).as("err_c"))
        AsOf.joinForward(left, right, "user_id", "ts", "ets", "err_c")
          .select(col("event_id"), col("asof_err_c"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, r.err_c AS asof_err_c
             |FROM events l ASOF LEFT JOIN
             | (SELECT user_id, ts AS ets, CAST(ROUND(value*100) AS BIGINT) AS err_c
             |  FROM events WHERE event_type = 'error') r
             |ON l.user_id = r.user_id AND l.ts <= r.ets
             |ORDER BY l.event_id""".stripMargin)),

    // Nearest as-of (no native DuckDB form): oracle is a LEFT JOIN
    // LATERAL argmin over |Δt| with the same backward tie rule the
    // operator pins (equal distance → earlier right row). Comparison in
    // epoch_us space — see Temporal's nanosecond note.
    Q("a11_asof_nearest",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val left = ev.select(col("user_id"), col("ts"), col("event_id"))
        val right = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("ts").as("ets"), cents(col("value")).as("err_c"))
        AsOf.joinNearest(left, right, "user_id", "ts", "ets", "err_c")
          .select(col("event_id"), col("asof_err_c"))
          .orderBy("event_id")
      },
      Some("""SELECT l.event_id, x.err_c AS asof_err_c
             |FROM events l LEFT JOIN LATERAL (
             |  SELECT r.err_c
             |  FROM (SELECT user_id, ts AS ets,
             |          CAST(ROUND(value*100) AS BIGINT) AS err_c
             |        FROM events WHERE event_type = 'error') r
             |  WHERE r.user_id = l.user_id
             |  ORDER BY abs(epoch_us(r.ets) - epoch_us(l.ts)), r.ets
             |  LIMIT 1) x ON TRUE
             |ORDER BY l.event_id""".stripMargin)),

    // Self as-of via window lag: previous order date + day delta
    Q("a2_prev_order",
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        t(s, dir, "orders")
          .filter(col("o_custkey") % 50 === 0)
          .select(col("o_custkey"), col("o_orderkey"),
            col("o_orderdate").cast(DateType).as("od"),
            lag(col("o_orderdate").cast(DateType), 1).over(w).as("prev_od"))
          .withColumn("gap_days",
            datediff(col("od"), col("prev_od")).cast(LongType))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, od, prev_od,
             | CAST(date_diff('day', prev_od, od) AS BIGINT) AS gap_days
             |FROM (
             | SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
             |  LAG(CAST(o_orderdate AS DATE), 1) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_od
             | FROM orders WHERE o_custkey % 50 = 0)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Exact statistics: count distinct, integer-exact variance, median
    Q("a3_stats",
      (s, dir) => {
        val q = col("l_quantity").cast(LongType)
        t(s, dir, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            count(lit(1)).as("cnt"),
            countDistinct(q).as("n_q"),
            sum(q).as("sum_q"),
            sum(q * q).as("sumsq_q"),
            expr("percentile(CAST(l_quantity AS BIGINT), 0.5)").as("median_q"))
          .withColumn("var_c",
            expr("(cnt * sumsq_q - sum_q * sum_q) * 100 div (cnt * (cnt - 1))"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, cnt, n_q, sum_q, sumsq_q, median_q,
             | (cnt * sumsq_q - sum_q * sum_q) * 100 // (cnt * (cnt - 1)) AS var_c
             |FROM (
             | SELECT l_returnflag, COUNT(*) AS cnt,
             |  COUNT(DISTINCT CAST(l_quantity AS BIGINT)) AS n_q,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_q,
             |  CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sumsq_q,
             |  quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS median_q
             | FROM lineitem GROUP BY 1)
             |ORDER BY l_returnflag""".stripMargin)),

    // A12 — exact WEIGHTED median (lower form): smallest price whose
    // cumulative quantity-weight reaches half the group total — the
    // inventory-weighted "typical price" a9's unweighted quantiles
    // miss. Per-group cumulative sum runs under a PARTITIONED ordered
    // window (group-parallel — no lone-partition sort), the target is
    // a broadcastable group-grain frame, all arithmetic integer.
    Q("a12_weighted_median",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = t(s, dir, "lineitem").select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast(LongType).as("price_c"),
          col("l_quantity").cast(LongType).as("w"))
        val g = li.groupBy("l_returnflag", "price_c")
          .agg(sum(col("w")).as("w"))
        val cum = g.withColumn("cw", sum(col("w")).over(
          Window.partitionBy("l_returnflag").orderBy("price_c")
            .rowsBetween(Window.unboundedPreceding, 0)))
        val tot = g.groupBy("l_returnflag")
          .agg(expr("(sum(w) + 1) div 2").as("half"),
            sum(col("w")).as("total_w"))
        cum.join(broadcast(tot), "l_returnflag")
          .filter(col("cw") >= col("half"))
          .groupBy("l_returnflag")
          .agg(min(col("price_c")).as("wmedian_c"),
            min(col("total_w")).as("total_w"))
          .orderBy("l_returnflag")
      },
      Some("""WITH g AS (SELECT l_returnflag,
             |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
             |  FROM lineitem GROUP BY 1, 2),
             |cum AS (SELECT l_returnflag, price_c, w,
             |    CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price_c
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw
             |  FROM g),
             |tot AS (SELECT l_returnflag,
             |    CAST((SUM(w) + 1) // 2 AS BIGINT) AS half,
             |    CAST(SUM(w) AS BIGINT) AS total_w
             |  FROM g GROUP BY 1)
             |SELECT l_returnflag, CAST(MIN(price_c) AS BIGINT) AS wmedian_c,
             |  CAST(MIN(total_w) AS BIGINT) AS total_w
             |FROM cum JOIN tot USING (l_returnflag)
             |WHERE cw >= half
             |GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // exact multi-quantile profile (linear interpolation over exact
    // cents — both engines interpolate a + (b-a)*frac over sorted ints,
    // so the doubles agree bit-for-bit)
    Q("a9_percentiles",
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          expr("percentile(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.25)").as("p25_c"),
          expr("percentile(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.5)").as("p50_c"),
          expr("percentile(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.9)").as("p90_c"),
          expr("percentile(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.99)").as("p99_c"))
        .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             | quantile_cont(c, 0.25) AS p25_c,
             | quantile_cont(c, 0.5) AS p50_c,
             | quantile_cont(c, 0.9) AS p90_c,
             | quantile_cont(c, 0.99) AS p99_c
             |FROM (SELECT o_orderpriority,
             |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS c FROM orders)
             |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)),

    // od1 — robust outlier detection: rows > 3 MAD from their user's
    // median event value. All stats in exact cents; percentile
    // interpolation over longs yields dyadic rationals, so the
    // |x−med| > 3·MAD cut is bit-identical in both engines (no rounding
    // needed). Three scans, zero raw shuffles, stats broadcast back.
    Q("od1_mad_outliers",
      (s, dir) => graft.operators.Robust.madOutliers(
        t(s, dir, "events").select("user_id", "event_id", "value"),
        "user_id", "value", 3.0)
        .select("user_id", "event_id", "value", "med", "mad")
        .orderBy("user_id", "event_id"),
      Some("""WITH c AS (SELECT user_id, event_id, value,
             |   CAST(ROUND(value*100) AS BIGINT) AS cc FROM events),
             |med AS (SELECT user_id, quantile_cont(cc, 0.5) AS medc
             |  FROM c GROUP BY 1),
             |mad AS (SELECT c.user_id, quantile_cont(abs(cc - medc), 0.5) AS madc
             |  FROM c JOIN med ON c.user_id = med.user_id GROUP BY 1)
             |SELECT c.user_id, event_id, value,
             |  medc / 100.0 AS med, madc / 100.0 AS mad
             |FROM c JOIN med ON c.user_id = med.user_id
             |      JOIN mad ON c.user_id = mad.user_id
             |WHERE abs(cc - medc) > 3.0 * madc
             |ORDER BY c.user_id, event_id""".stripMargin)),

    // TPC-H Q6: forecast revenue change — scan + pushed filters + agg
    Q("q6_revenue_delta",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice") * col("l_discount"))).as("revenue_c"),
          count(lit(1)).as("cnt")),
      Some("""SELECT CAST(SUM(CAST(ROUND(l_extendedprice*l_discount*100) AS BIGINT)) AS BIGINT) AS revenue_c,
             | COUNT(*) AS cnt
             |FROM lineitem
             |WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1997-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin),
      bench = true),

    // TPC-H Q18-shaped: large-quantity orders (HAVING over a join). Two
    // runtime-verified physical shortcuts, each with a measured fallback:
    //  1. groupByClustered: ingest writes lineitem in orderkey order, so
    //     the 60M-row aggregate's shuffle moves data that is already
    //     co-located. One cached verification pass proves no key spans
    //     two scan partitions; if it does (file split mid-key, random
    //     layout), the standard shuffle aggregate runs unchanged.
    //     Measured at the 100x replica: 2.46 -> 1.60 s.
    //  2. TopKJoin.limitJoin: TakeOrderedAndProject over the 2.9M-row
    //     HAVING side, then a 100-row broadcast probe of orders —
    //     adaptive refill (probe returns 100 rows ⇒ they are the global
    //     top-100; fewer ⇒ escalate the prefix) replaces both the
    //     2.9M-entry broadcast hash build per run AND the PK/FK
    //     verification scans the round-7 verified variant paid once per
    //     session. The sort carries l_orderkey (= the join key, so
    //     identical to o_orderkey on every surviving row) as
    //     tiebreaker: a total order makes top-100 deterministic.
    Q("q18_big_orders",
      (s, dir) => {
        val l = t(s, dir, "lineitem").select("l_orderkey", "l_quantity")
        val big = graft.operators.ClusteredAgg.groupByClustered(l, "l_orderkey",
          Seq(sum(col("l_quantity").cast(LongType)).as("total_qty")))
          .filter(col("total_qty") > 150)
        val o = t(s, dir, "orders")
        graft.operators.TopKJoin.limitJoin(big, o, "l_orderkey", "o_orderkey",
          Seq(desc_nulls_last("total_qty"), asc_nulls_first("l_orderkey")), 100)
          .select(col("o_custkey"), col("o_orderkey"),
            cents(col("o_totalprice")).as("total_c"), col("total_qty"))
          .orderBy(desc_nulls_last("total_qty"), asc_nulls_first("o_orderkey"))
          .limit(100)
      },
      Some("""SELECT o_custkey, o_orderkey,
             | CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c, total_qty
             |FROM orders JOIN (
             | SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
             | FROM lineitem GROUP BY 1 HAVING CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) > 150
             |) ON o_orderkey = l_orderkey
             |ORDER BY total_qty DESC NULLS LAST, o_orderkey NULLS FIRST
             |LIMIT 100""".stripMargin),
      bench = true),

    // Salted skew join: result must equal the plain inner join (salting
    // is a physical-layout transform, not a semantic one)
    Q("r2_join_salted",
      (s, dir) => {
        val c = t(s, dir, "customer")
          .select(nullif(col("c_custkey") % 100, lit(7)).as("k"), col("c_acctbal"))
        val o = t(s, dir, "orders")
          .select(nullif(col("o_custkey") % 100, lit(7)).as("k"), col("o_totalprice"))
        Skew.saltedJoin(o, c, Seq("k"), salt = 8)
          .groupBy("k")
          .agg(count(lit(1)).as("cnt"),
            sum(cents(col("o_totalprice"))).as("total_c"),
            sum(cents(col("c_acctbal"))).as("acct_c"))
          .orderBy(asc_nulls_first("k"))
      },
      Some("""SELECT k, COUNT(*) AS cnt,
             | CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c,
             | CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acct_c
             |FROM (SELECT NULLIF(o_custkey % 100, 7) AS k, o_totalprice FROM orders) o
             |JOIN (SELECT NULLIF(c_custkey % 100, 7) AS k, c_acctbal FROM customer) c
             |USING (k)
             |GROUP BY k ORDER BY k NULLS FIRST""".stripMargin)),

    // PIVOT with pinned values ↔ conditional aggregation
    Q("p1_pivot",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast(LongType)))
        .withColumnsRenamed(Map("F" -> "qty_f", "O" -> "qty_o"))
        .orderBy(asc_nulls_first("l_returnflag")),
      Some("""SELECT l_returnflag,
             | CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER (l_linestatus = 'F') AS BIGINT) AS qty_f,
             | CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER (l_linestatus = 'O') AS BIGINT) AS qty_o
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag NULLS FIRST""".stripMargin)),

    // UNPIVOT (melt) back to long form
    Q("p2_unpivot",
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast(LongType)))
        .unpivot(Array(col("l_returnflag")),
          Array(col("F"), col("O")), "status", "qty")
        .filter(col("qty").isNotNull)
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("status")),
      Some("""SELECT l_returnflag, status, qty FROM (
             | SELECT l_returnflag, 'F' AS status,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER (l_linestatus = 'F') AS BIGINT) AS qty
             | FROM lineitem GROUP BY l_returnflag
             | UNION ALL
             | SELECT l_returnflag, 'O' AS status,
             |  CAST(SUM(CAST(l_quantity AS BIGINT)) FILTER (l_linestatus = 'O') AS BIGINT) AS qty
             | FROM lineitem GROUP BY l_returnflag
             |) WHERE qty IS NOT NULL
             |ORDER BY l_returnflag NULLS FIRST, status NULLS FIRST""".stripMargin)),

    // Schema-driven nested parsing: JSON string → struct via the schema
    // DSL (the reference's str_as_json coercion path, slide/utils.py:683-691)
    Q("j2_from_json",
      (s, dir) => {
        val st = SchemaDSL.parse("k:long")
        t(s, dir, "events")
          .filter(col("event_id") % 100 === 0)
          .select(col("event_id"),
            from_json(col("props"), st).getField("k").as("k"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
             |FROM events WHERE event_id % 100 = 0
             |ORDER BY event_id""".stripMargin))
  )
}
