package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Frame
import graft.sources.Tables

/** SURVEY §2.1 R1–R9 — the relational operator inventory, each exercised
  * end-to-end against the DuckDB oracle. Join/set-op results are
  * aggregated after the operator so outputs are small and deterministic
  * while still hashing every semantic detail (match counts, NULL-key
  * behavior, duplicate preservation).
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** cents integerization: exact integer sums independent of order */
  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** customer projected to a derived join key with injected NULLs
    * (`k = NULLIF(c_custkey % 100, 7)`) to exercise SQL NULL-key join
    * semantics (ref: slide/utils.py:909-946).
    */
  private def custK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      nullif(col("c_custkey") % 100, lit(7)).as("k"),
      col("c_custkey"), col("c_acctbal"))

  private def ordK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(
      nullif(col("o_custkey") % 100, lit(7)).as("k"),
      col("o_orderkey"), col("o_totalprice"))

  private val custKSql =
    "SELECT NULLIF(c_custkey % 100, 7) AS k, c_custkey, c_acctbal FROM customer"
  private val ordKSql =
    "SELECT NULLIF(o_custkey % 100, 7) AS k, o_orderkey, o_totalprice FROM orders"

  /** aggregate a join result down to per-key counts + exact sums */
  private def joinSummary(j: DataFrame): DataFrame =
    j.groupBy(col("k"))
      .agg(
        count(lit(1)).as("cnt"),
        count(col("c_custkey")).as("cnt_left"),
        count(col("o_orderkey")).as("cnt_right"),
        coalesce(sum(cents(col("c_acctbal"))), lit(0L)).as("acct_c"),
        coalesce(sum(cents(col("o_totalprice"))), lit(0L)).as("total_c"))
      .orderBy(asc_nulls_first("k"))

  private def joinSummarySql(joined: String): String =
    s"""SELECT k, COUNT(*) AS cnt, COUNT(c_custkey) AS cnt_left,
       | COUNT(o_orderkey) AS cnt_right,
       | COALESCE(CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT), 0) AS acct_c,
       | COALESCE(CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT), 0) AS total_c
       |FROM ($joined) GROUP BY k ORDER BY k NULLS FIRST""".stripMargin

  private def joinQ(name: String, joinType: String, sqlJoin: String): Q = Q(
    name,
    (s, dir) => joinSummary(
      Frame(custK(s, dir)).join(Frame(ordK(s, dir)), joinType, Seq("k")).df),
    Some(joinSummarySql(sqlJoin)))

  /** set-op input frames: overlapping projections with injected NULLs */
  private def setA(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") % 3 =!= 0)
      .select(
        nullif(col("c_nationkey") % 5, lit(2)).as("nk"),
        nullif(col("c_mktsegment"), lit("BUILDING")).as("seg"))
  private def setB(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .filter(col("c_custkey") % 2 === 0)
      .select(
        nullif(col("c_nationkey") % 5, lit(2)).as("nk2"),
        nullif(col("c_mktsegment"), lit("MACHINERY")).as("seg2"))

  private val setASql =
    """SELECT NULLIF(c_nationkey % 5, 2) AS nk, NULLIF(c_mktsegment, 'BUILDING') AS seg
      |FROM customer WHERE c_custkey % 3 <> 0""".stripMargin
  private val setBSql =
    """SELECT NULLIF(c_nationkey % 5, 2) AS nk2, NULLIF(c_mktsegment, 'MACHINERY') AS seg2
      |FROM customer WHERE c_custkey % 2 = 0""".stripMargin

  private def setOut(df: DataFrame): DataFrame =
    df.groupBy("nk", "seg").agg(count(lit(1)).as("cnt"))
      .orderBy(asc_nulls_first("nk"), asc_nulls_first("seg"))
  private def setOutSql(inner: String): String =
    s"""SELECT nk, seg, COUNT(*) AS cnt FROM ($inner) GROUP BY nk, seg
       |ORDER BY nk NULLS FIRST, seg NULLS FIRST""".stripMargin

  def all: Seq[Q] = Seq(

    // R1 — WHERE with a boolean predicate (+ pushdown-friendly plan)
    Q("r1_filter_where",
      (s, dir) => Frame(t(s, dir, "lineitem"))
        .filter(col("l_shipdate") < lit("1996-01-01") && col("l_discount") > 0.05)
        .df.groupBy("l_returnflag")
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity").cast(LongType)).as("qty"))
        .orderBy(asc_nulls_first("l_returnflag")),
      Some("""SELECT l_returnflag, COUNT(*) AS cnt,
             | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
             |FROM lineitem WHERE l_shipdate < '1996-01-01' AND l_discount > 0.05
             |GROUP BY l_returnflag ORDER BY l_returnflag NULLS FIRST""".stripMargin)),

    // R1 — numeric-truthiness condition: NULL and 0 drop the row
    // (ref: slide/utils.py:318-335)
    Q("r1_filter_truthy",
      (s, dir) => Frame(t(s, dir, "lineitem"))
        .filter(nullif(col("l_linenumber") % 3, lit(1)))
        .df.groupBy("l_linenumber").agg(count(lit(1)).as("cnt"))
        .orderBy(asc_nulls_first("l_linenumber")),
      Some("""SELECT l_linenumber, COUNT(*) AS cnt FROM lineitem
             |WHERE NULLIF(l_linenumber % 3, 1) IS NOT NULL
             |  AND NULLIF(l_linenumber % 3, 1) <> 0
             |GROUP BY l_linenumber ORDER BY l_linenumber NULLS FIRST""".stripMargin)),

    // R2 — the seven join types over NULL-bearing keys
    joinQ("r2_join_inner", "inner",
      s"SELECT * FROM ($custKSql) a JOIN ($ordKSql) b USING (k)"),
    joinQ("r2_join_left", "left",
      s"SELECT a.k, a.c_custkey, a.c_acctbal, b.o_orderkey, b.o_totalprice " +
        s"FROM ($custKSql) a LEFT JOIN ($ordKSql) b ON a.k = b.k"),
    joinQ("r2_join_right", "right_outer",
      s"SELECT b.k, a.c_custkey, a.c_acctbal, b.o_orderkey, b.o_totalprice " +
        s"FROM ($custKSql) a RIGHT JOIN ($ordKSql) b ON a.k = b.k"),
    joinQ("r2_join_full", "full outer",
      s"SELECT COALESCE(a.k, b.k) AS k, a.c_custkey, a.c_acctbal, b.o_orderkey, b.o_totalprice " +
        s"FROM ($custKSql) a FULL JOIN ($ordKSql) b ON a.k = b.k"),

    Q("r2_join_semi",
      (s, dir) => Frame(custK(s, dir))
        .join(Frame(ordK(s, dir)), "semi", Seq("k"))
        .df.groupBy("k")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("c_acctbal"))).as("acct_c"))
        .orderBy(asc_nulls_first("k")),
      Some(s"""SELECT k, COUNT(*) AS cnt,
              | CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acct_c
              |FROM ($custKSql) a
              |WHERE EXISTS (SELECT 1 FROM ($ordKSql) b WHERE a.k = b.k)
              |GROUP BY k ORDER BY k NULLS FIRST""".stripMargin)),

    Q("r2_join_anti",
      (s, dir) => Frame(custK(s, dir))
        .join(Frame(ordK(s, dir)), "anti", Seq("k"))
        .df.groupBy("k")
        .agg(count(lit(1)).as("cnt"), sum(cents(col("c_acctbal"))).as("acct_c"))
        .orderBy(asc_nulls_first("k")),
      Some(s"""SELECT k, COUNT(*) AS cnt,
              | CAST(SUM(CAST(ROUND(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acct_c
              |FROM ($custKSql) a
              |WHERE NOT EXISTS (SELECT 1 FROM ($ordKSql) b WHERE a.k = b.k)
              |GROUP BY k ORDER BY k NULLS FIRST""".stripMargin)),

    Q("r2_join_cross",
      (s, dir) => Frame(t(s, dir, "region").select(col("r_name")))
        .join(Frame(t(s, dir, "nation").select(col("n_name"), col("n_regionkey"))), "cross")
        .df.groupBy("r_name").agg(count(lit(1)).as("cnt"), sum("n_regionkey").as("rk_sum"))
        .orderBy(asc_nulls_first("r_name")),
      Some("""SELECT r_name, COUNT(*) AS cnt, CAST(SUM(n_regionkey) AS BIGINT) AS rk_sum
             |FROM region CROSS JOIN nation
             |GROUP BY r_name ORDER BY r_name NULLS FIRST""".stripMargin)),

    // R3 — UNION ALL / UNION with positional column alignment
    // (ref: slide/utils.py:828-840,976-988; proof test suite:2205-2227)
    Q("r3_union_all",
      (s, dir) => setOut(Frame(setA(s, dir)).union(Frame(setB(s, dir)), unique = false).df),
      Some(setOutSql(s"$setASql UNION ALL $setBSql"))),
    Q("r3_union_distinct",
      (s, dir) => setOut(Frame(setA(s, dir)).union(Frame(setB(s, dir)), unique = true).df),
      Some(setOutSql(s"$setASql UNION $setBSql"))),

    // R3b — name-based union with missing-column NULL fill
    // (unionByName ↔ DuckDB UNION ALL BY NAME)
    Q("r3b_union_byname",
      (s, dir) => {
        val a = t(s, dir, "customer").filter(col("c_custkey") % 3 === 0)
          .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"))
        val b = t(s, dir, "supplier").filter(col("s_suppkey") % 2 === 0)
          .select(col("s_acctbal").as("bal"), col("s_suppkey").as("k"),
            col("s_name").as("sname"))
        a.unionByName(b, allowMissingColumns = true)
          .groupBy(col("sname").isNull.as("from_customer"))
          .agg(count(lit(1)).as("cnt"),
            sum(round(col("bal") * 100).cast(LongType)).as("bal_c"),
            sum("k").as("k_sum"))
          .orderBy("from_customer")
      },
      Some("""SELECT sname IS NULL AS from_customer, COUNT(*) AS cnt,
             | CAST(SUM(CAST(ROUND(bal*100) AS BIGINT)) AS BIGINT) AS bal_c,
             | CAST(SUM(k) AS BIGINT) AS k_sum
             |FROM (
             | SELECT c_custkey AS k, c_acctbal AS bal FROM customer
             | WHERE c_custkey % 3 = 0
             | UNION ALL BY NAME
             | SELECT s_acctbal AS bal, s_suppkey AS k, s_name AS sname
             | FROM supplier WHERE s_suppkey % 2 = 0)
             |GROUP BY 1 ORDER BY from_customer""".stripMargin)),

    // R4 — INTERSECT; unique=false keeps df1 duplicates (NULLs equal,
    // ref: slide/utils.py:842-854, suite:2281-2283)
    Q("r4_intersect",
      (s, dir) => setOut(Frame(setA(s, dir)).intersect(Frame(setB(s, dir)), unique = true).df),
      Some(setOutSql(s"$setASql INTERSECT $setBSql"))),
    Q("r4_intersect_dups",
      (s, dir) => setOut(Frame(setA(s, dir)).intersect(Frame(setB(s, dir)), unique = false).df),
      Some(setOutSql(
        s"""SELECT nk, seg FROM ($setASql) a WHERE EXISTS (
           | SELECT 1 FROM ($setBSql) b
           | WHERE a.nk IS NOT DISTINCT FROM b.nk2
           |   AND a.seg IS NOT DISTINCT FROM b.seg2)""".stripMargin))),

    // R5 — EXCEPT; unique=false keeps df1 duplicate copies
    // (ref: slide/utils.py:856-880)
    Q("r5_except",
      (s, dir) => setOut(Frame(setA(s, dir)).except(Frame(setB(s, dir)), unique = true).df),
      Some(setOutSql(s"$setASql EXCEPT $setBSql"))),
    Q("r5_except_dups",
      (s, dir) => setOut(Frame(setA(s, dir)).except(Frame(setB(s, dir)), unique = false).df),
      Some(setOutSql(
        s"""SELECT nk, seg FROM ($setASql) a WHERE NOT EXISTS (
           | SELECT 1 FROM ($setBSql) b
           | WHERE a.nk IS NOT DISTINCT FROM b.nk2
           |   AND a.seg IS NOT DISTINCT FROM b.seg2)""".stripMargin))),

    // R6 — SELECT DISTINCT *, NULLs equal each other (suite:2160-2161)
    Q("r6_distinct",
      (s, dir) => Frame(setA(s, dir)).dropDuplicates().df
        .orderBy(asc_nulls_first("nk"), asc_nulls_first("seg")),
      Some(s"""SELECT DISTINCT nk, seg FROM ($setASql)
              |ORDER BY nk NULLS FIRST, seg NULLS FIRST""".stripMargin)),

    // R7 — groupBy aggregate with NULL keys retained
    // (ref: slide_pandas/utils.py:91 dropna=False; native in Spark)
    Q("r7_groupby_agg",
      (s, dir) => Frame(t(s, dir, "orders")
        .select(nullif(col("o_custkey") % 10, lit(3)).as("gk"), col("o_totalprice")))
        .groupAgg(Seq("gk"),
          "cnt" -> count(lit(1)),
          "total_c" -> sum(cents(col("o_totalprice"))),
          "max_c" -> max(cents(col("o_totalprice"))),
          "min_c" -> min(cents(col("o_totalprice"))))
        .df.orderBy(asc_nulls_first("gk")),
      Some("""SELECT NULLIF(o_custkey % 10, 3) AS gk, COUNT(*) AS cnt,
             | CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c,
             | MAX(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS max_c,
             | MIN(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS min_c
             |FROM orders GROUP BY 1 ORDER BY gk NULLS FIRST""".stripMargin)),

    // R7 — arbitrary per-group df→df transform via groupByKey.flatMapGroups
    // (ref: slide/utils.py:765-788) checked against a SQL aggregate oracle
    Q("r7_group_apply",
      (s, dir) => {
        val out = StructType(Seq(
          StructField("o_orderpriority", StringType),
          StructField("cnt", LongType),
          StructField("total_c", LongType)))
        Frame(t(s, dir, "orders").select(col("o_orderpriority"), col("o_totalprice")))
          .groupApply(Seq("o_orderpriority"), out) { it =>
            var key: String = null
            var cnt = 0L
            var total = 0L
            it.foreach { r =>
              key = r.getString(0)
              cnt += 1
              total += math.round(r.getDouble(1) * 100)
            }
            Iterator(Row(key, cnt, total))
          }.df.orderBy(asc_nulls_first("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS cnt,
             | CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
             |FROM orders GROUP BY 1 ORDER BY o_orderpriority NULLS FIRST""".stripMargin)),

    // R7b — group transform emitting n rows per group (the UDTF shape of
    // sql_groupby_apply): top-2 orders per priority chosen inside the
    // closure, checked against a window-function oracle
    Q("r7b_group_apply_topn",
      (s, dir) => {
        val out = StructType(Seq(
          StructField("o_orderpriority", StringType),
          StructField("o_orderkey", LongType),
          StructField("total_c", LongType)))
        Frame(t(s, dir, "orders")
          .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice")))
          .groupApply(Seq("o_orderpriority"), out) { it =>
            val rows = it.map(r => (r.getString(0), r.getLong(1),
              math.round(r.getDouble(2) * 100))).toVector
            rows.sortBy { case (_, key, cents) => (-cents, key) }
              .take(2).iterator
              .map { case (p, key, cents) => Row(p, key, cents) }
          }.df.orderBy("o_orderpriority", "o_orderkey")
      },
      Some("""SELECT o_orderpriority, o_orderkey, total_c FROM (
             | SELECT o_orderpriority, o_orderkey,
             |  CAST(ROUND(o_totalprice*100) AS BIGINT) AS total_c,
             |  ROW_NUMBER() OVER (PARTITION BY o_orderpriority
             |   ORDER BY CAST(ROUND(o_totalprice*100) AS BIGINT) DESC, o_orderkey) AS rn
             | FROM orders)
             |WHERE rn <= 2 ORDER BY o_orderpriority, o_orderkey""".stripMargin)),

    // R8 — projection/construction from expressions and constants
    Q("r8_select",
      (s, dir) => Frame(t(s, dir, "customer")).select(
        "id" -> col("c_custkey"),
        "uname" -> upper(col("c_name")),
        "bal_c" -> cents(col("c_acctbal")),
        "tag" -> lit("x"))
        .df.orderBy(asc_nulls_first("id")),
      Some("""SELECT c_custkey AS id, UPPER(c_name) AS uname,
             | CAST(ROUND(c_acctbal*100) AS BIGINT) AS bal_c, 'x' AS tag
             |FROM customer ORDER BY id NULLS FIRST""".stripMargin)),

    // R9 — emptiness predicate (ref: slide/utils.py:619-625)
    Q("r9_empty",
      (s, dir) => {
        val empty = Frame(t(s, dir, "region")).filter(false).isEmpty
        val nonEmpty = Frame(t(s, dir, "region")).isEmpty
        s.range(1).select(lit(empty).as("empty_true"), lit(nonEmpty).as("empty_false"))
      },
      Some("""SELECT (SELECT COUNT(*) FROM region WHERE FALSE) = 0 AS empty_true,
             | (SELECT COUNT(*) FROM region) = 0 AS empty_false""".stripMargin))
  )
}
