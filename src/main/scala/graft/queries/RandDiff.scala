package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Kernels
import graft.operators.Frame
import graft.testgen.RandFrame
import graft.testgen.RandFrame._

/** Seeded random-frame differential suite — the port of the reference's
  * `make_rand_df` fuzz strategy (ref: slide_test/utils.py:93-130, used
  * throughout slide_test/suite.py). Each query generates deterministic
  * random frames (fixed seed, reference domains: ints [0,10), floats on
  * a 10^-6 grid in [0,1), strings ssssss0..9, datetimes 2020-01-01+k,
  * exact NULL counts) and runs the operator surface over them; the
  * oracle SQL embeds the IDENTICAL rows as a VALUES subquery, so the
  * driver's DuckDB hash-compare checks the semantics on data the
  * fixtures never enumerated — NULL-key joins at 40% null density,
  * set ops over half-NULL frames, 3VL on random NULL patterns.
  *
  * Canonical invocations follow FIXTURES.md §A1 / suite:653-2566.
  */
object RandDiff {

  // ---- frame specs (canonical invocations) ----

  // joins (suite:2468-2566): x=100 rows 40% null keys, y=80 rows 10%
  private val jx = Seq(ColSpec("a", CInt, 40), ColSpec("b", CDateTime, 40),
    ColSpec("c", CFloat, 40))
  private val jy = Seq(ColSpec("d", CFloat, 10), ColSpec("a", CInt, 10),
    ColSpec("b", CDateTime, 10))
  private val jxSeed = 1001L
  private val jySeed = 1002L

  // set-op triple (suite:2230-2346): 30/80/100 rows, half-null tails;
  // the middle frame's names differ to prove positional alignment
  private val sx = Seq(ColSpec("b", CInt, 10), ColSpec("c", CStr, 10),
    ColSpec("d", CDateTime, 10))
  private val sy = Seq(ColSpec("q", CInt, 50), ColSpec("r", CStr, 50),
    ColSpec("s", CDateTime, 50))
  private val sz = Seq(ColSpec("b", CInt, 50), ColSpec("c", CStr, 50),
    ColSpec("d", CDateTime, 50))
  private val Seq(sxSeed, sySeed, szSeed) = Seq(2001L, 2002L, 2003L)

  private def jxDf(s: SparkSession) = RandFrame.df(s, 100, jxSeed, jx: _*)
  private def jyDf(s: SparkSession) = RandFrame.df(s, 80, jySeed, jy: _*)
  private val jxSql = RandFrame.valuesSql(100, jxSeed, jx: _*)
  private val jySql = RandFrame.valuesSql(80, jySeed, jy: _*)

  private def sxDf(s: SparkSession) = RandFrame.df(s, 30, sxSeed, sx: _*)
  private def syDf(s: SparkSession) = RandFrame.df(s, 80, sySeed, sy: _*)
  private def szDf(s: SparkSession) = RandFrame.df(s, 100, szSeed, sz: _*)
  private val sxSql = RandFrame.valuesSql(30, sxSeed, sx: _*)
  private val sySql = RandFrame.valuesSql(80, sySeed, sy: _*)
  private val szSql = RandFrame.valuesSql(100, szSeed, sz: _*)

  private def sortAll(df: DataFrame): DataFrame =
    df.orderBy(df.columns.map(asc_nulls_first).toIndexedSeq: _*)

  private def orderAll(cols: String*): String =
    "ORDER BY " + cols.map(c => s"$c NULLS FIRST").mkString(", ")

  def all: Seq[Q] = Seq(

    Q("rf1_join_inner",
      (s, dir) => sortAll(Frame(jxDf(s)).join(Frame(jyDf(s)), "inner", Seq("a", "b")).df),
      Some(s"""SELECT x.a, x.b, x.c, y.d
              |FROM $jxSql x JOIN $jySql y ON x.a = y.a AND x.b = y.b
              |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin)),

    Q("rf2_join_left",
      (s, dir) => sortAll(Frame(jxDf(s)).join(Frame(jyDf(s)), "left", Seq("a", "b")).df),
      Some(s"""SELECT x.a, x.b, x.c, y.d
              |FROM $jxSql x LEFT JOIN $jySql y ON x.a = y.a AND x.b = y.b
              |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST, 4 NULLS FIRST""".stripMargin)),

    Q("rf3_join_full",
      (s, dir) => sortAll(Frame(jxDf(s)).join(Frame(jyDf(s)), "full", Seq("a", "b")).df),
      Some(s"""SELECT COALESCE(x.a, y.a) AS a, COALESCE(x.b, y.b) AS b, x.c, y.d
              |FROM $jxSql x FULL JOIN $jySql y ON x.a = y.a AND x.b = y.b
              |${orderAll("a", "b", "c", "d")}""".stripMargin)),

    Q("rf4_join_semi",
      (s, dir) => sortAll(Frame(jxDf(s)).join(Frame(jyDf(s)), "semi", Seq("a", "b")).df),
      Some(s"""SELECT x.a, x.b, x.c FROM $jxSql x
              |WHERE EXISTS (SELECT 1 FROM $jySql y WHERE y.a = x.a AND y.b = x.b)
              |${orderAll("a", "b", "c")}""".stripMargin)),

    Q("rf5_join_anti",
      (s, dir) => sortAll(Frame(jxDf(s)).join(Frame(jyDf(s)), "anti", Seq("a", "b")).df),
      Some(s"""SELECT x.a, x.b, x.c FROM $jxSql x
              |WHERE NOT EXISTS (SELECT 1 FROM $jySql y WHERE y.a = x.a AND y.b = x.b)
              |${orderAll("a", "b", "c")}""".stripMargin)),

    // (x UNION ALL y) UNION z — y's columns align positionally
    Q("rf6_union_triple",
      (s, dir) => sortAll(
        Frame(sxDf(s)).union(Frame(syDf(s)))
          .union(Frame(szDf(s)), unique = true).df),
      Some(s"""SELECT b, c, d FROM (
              | SELECT * FROM (
              |  SELECT b, c, d FROM $sxSql _x
              |  UNION ALL
              |  SELECT q AS b, r AS c, s AS d FROM $sySql _y) _u
              | UNION
              | SELECT b, c, d FROM $szSql _z)
              |${orderAll("b", "c", "d")}""".stripMargin)),

    Q("rf7_intersect_triple",
      (s, dir) => sortAll(
        Frame(sxDf(s)).union(Frame(syDf(s)))
          .intersect(Frame(szDf(s)), unique = true).df),
      Some(s"""SELECT b, c, d FROM (
              | SELECT b, c, d FROM (
              |  SELECT b, c, d FROM $sxSql _x
              |  UNION ALL
              |  SELECT q AS b, r AS c, s AS d FROM $sySql _y) _u
              | INTERSECT
              | SELECT b, c, d FROM $szSql _z)
              |${orderAll("b", "c", "d")}""".stripMargin)),

    Q("rf8_except_triple",
      (s, dir) => sortAll(
        Frame(sxDf(s)).union(Frame(syDf(s)))
          .except(Frame(szDf(s)), unique = true).df),
      Some(s"""SELECT b, c, d FROM (
              | SELECT b, c, d FROM (
              |  SELECT b, c, d FROM $sxSql _x
              |  UNION ALL
              |  SELECT q AS b, r AS c, s AS d FROM $sySql _y) _u
              | EXCEPT
              | SELECT b, c, d FROM $szSql _z)
              |${orderAll("b", "c", "d")}""".stripMargin)),

    // DISTINCT over half-null int pairs (suite:2164-2193)
    Q("rf9_distinct",
      (s, dir) => sortAll(Frame(
        RandFrame.df(s, 100, 3001L, ColSpec("a", CInt, 50), ColSpec("b", CInt, 50)))
        .dropDuplicates().df),
      Some(s"""SELECT DISTINCT a, b
              |FROM ${RandFrame.valuesSql(100, 3001L, ColSpec("a", CInt, 50), ColSpec("b", CInt, 50))} _t
              |${orderAll("a", "b")}""".stripMargin)),

    // COALESCE over half-null columns of every scalar type (suite:694-816)
    Q("rf10_coalesce", {
      (s, dir) =>
        val spec = Seq(ColSpec("a", CFloat, 50), ColSpec("b", CFloat, 50),
          ColSpec("c", CFloat, 50), ColSpec("d", CInt, 50), ColSpec("e", CInt, 50),
          ColSpec("f", CStr, 50), ColSpec("g", CStr, 50),
          ColSpec("h", CDateTime, 50), ColSpec("i", CDateTime, 50))
        sortAll(RandFrame.df(s, 100, 4001L, spec: _*).select(
          coalesce(col("a"), col("b"), col("c")).as("fl"),
          coalesce(col("d"), col("e")).as("it"),
          coalesce(col("f"), col("g")).as("st"),
          coalesce(col("h"), col("i")).as("dt")))
    },
      Some {
        val spec = Seq(ColSpec("a", CFloat, 50), ColSpec("b", CFloat, 50),
          ColSpec("c", CFloat, 50), ColSpec("d", CInt, 50), ColSpec("e", CInt, 50),
          ColSpec("f", CStr, 50), ColSpec("g", CStr, 50),
          ColSpec("h", CDateTime, 50), ColSpec("i", CDateTime, 50))
        s"""SELECT COALESCE(a, b, c) AS fl, COALESCE(d, e) AS it,
           | COALESCE(f, g) AS st, COALESCE(h, i) AS dt
           |FROM ${RandFrame.valuesSql(100, 4001L, spec: _*)} _t
           |${orderAll("fl", "it", "st", "dt")}""".stripMargin
      }),

    // BETWEEN 3VL over random NULL patterns (suite:653)
    Q("rf11_between", {
      (s, dir) =>
        val spec = Seq(ColSpec("a", CFloat, 20), ColSpec("b", CFloat, 20),
          ColSpec("c", CFloat, 20))
        sortAll(RandFrame.df(s, 100, 5001L, spec: _*).select(
          col("a"), col("b"), col("c"),
          Kernels.isBetween(col("a"), col("b"), col("c"), positive = true).as("btw"),
          Kernels.isBetween(col("a"), col("b"), col("c"), positive = false).as("nbtw")))
    },
      Some {
        val spec = Seq(ColSpec("a", CFloat, 20), ColSpec("b", CFloat, 20),
          ColSpec("c", CFloat, 20))
        s"""SELECT a, b, c, a >= b AND a <= c AS btw,
           | NOT (a >= b AND a <= c) AS nbtw
           |FROM ${RandFrame.valuesSql(100, 5001L, spec: _*)} _t
           |${orderAll("a", "b", "c", "btw", "nbtw")}""".stripMargin
      }),

    // groupBy-agg with NULL keys over random frames (suite:2020-2153's
    // group semantics at fuzz density). Float columns only pass through
    // min/max/count — never SUM/AVG, whose result depends on summation
    // order once values are off the exact-integer grid.
    Q("rf13_groupby_agg", {
      (s, dir) =>
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CFloat, 20),
          ColSpec("c", CInt, 20))
        Frame(RandFrame.df(s, 100, 7001L, spec: _*))
          .groupAgg(Seq("a"),
            "cnt" -> count(lit(1)),
            "cnt_b" -> count(col("b")),
            "sum_c" -> sum(col("c")),
            "min_b" -> min(col("b")),
            "max_b" -> max(col("b")))
          .df.orderBy(asc_nulls_first("a"))
    },
      Some {
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CFloat, 20),
          ColSpec("c", CInt, 20))
        s"""SELECT a, COUNT(*) AS cnt, COUNT(b) AS cnt_b,
           | CAST(SUM(c) AS BIGINT) AS sum_c,
           | MIN(b) AS min_b, MAX(b) AS max_b
           |FROM ${RandFrame.valuesSql(100, 7001L, spec: _*)} _t
           |GROUP BY a ORDER BY a NULLS FIRST""".stripMargin
      }),

    // rank-family windows over random NULL patterns: rank/dense_rank/
    // percent_rank are value-determined (safe under ties), row_number is
    // not — deliberately absent
    Q("rf14_window_rank", {
      (s, dir) =>
        val spec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CFloat, 10))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("a")).orderBy(asc_nulls_first("b"))
        sortAll(RandFrame.df(s, 100, 8001L, spec: _*).select(
          col("a"), col("b"),
          rank().over(w).cast(org.apache.spark.sql.types.LongType).as("rk"),
          dense_rank().over(w).cast(org.apache.spark.sql.types.LongType).as("drk"),
          percent_rank().over(w).as("prk")))
    },
      Some {
        val spec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CFloat, 10))
        s"""SELECT a, b,
           | CAST(RANK() OVER w AS BIGINT) AS rk,
           | CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
           | PERCENT_RANK() OVER w AS prk
           |FROM ${RandFrame.valuesSql(100, 8001L, spec: _*)} _t
           |WINDOW w AS (PARTITION BY a ORDER BY b NULLS FIRST)
           |${orderAll("a", "b", "rk", "drk", "prk")}""".stripMargin
      }),

    // group-apply (flatMapGroups) over random NULL-key groups: per-group
    // closure logic checked against a window oracle — NULL keys form a
    // group like any other (suite:2020-2153 at fuzz density). Ints are
    // the only payload so the closure's arithmetic is exact.
    Q("rf15_group_apply", {
      (s, dir) =>
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CInt, 10),
          ColSpec("c", CStr, 10))
        val out = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("a",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("b_sum",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("c_max",
            org.apache.spark.sql.types.StringType)))
        Frame(RandFrame.df(s, 100, 9001L, spec: _*))
          .groupApply(Seq("a"), out) { it =>
            val rows = it.toVector
            val key = rows.head.isNullAt(0) match {
              case true => null; case false => java.lang.Long.valueOf(rows.head.getLong(0))
            }
            val bs = rows.collect { case r if !r.isNullAt(1) => r.getLong(1) }
            val cs = rows.collect { case r if !r.isNullAt(2) => r.getString(2) }
            Iterator(org.apache.spark.sql.Row(key, rows.size.toLong,
              if (bs.isEmpty) null else java.lang.Long.valueOf(bs.sum),
              if (cs.isEmpty) null else cs.max))
          }.df.orderBy(asc_nulls_first("a"))
    },
      Some {
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CInt, 10),
          ColSpec("c", CStr, 10))
        s"""SELECT a, COUNT(*) AS n, CAST(SUM(b) AS BIGINT) AS b_sum,
           | MAX(c) AS c_max
           |FROM ${RandFrame.valuesSql(100, 9001L, spec: _*)} _t
           |GROUP BY a ORDER BY a NULLS FIRST""".stripMargin
      }),

    // temporal fuzz: interval add, hour-truncation, dow, minute spans
    // and greatest/least over minute-granularity timestamps at 17–33%
    // null density. mins_between goes through greatest-least so the
    // dividend is non-negative (Spark `div` truncates toward zero,
    // DuckDB `//` floors — they only agree on non-negatives; minute
    // granularity additionally makes the division exact).
    Q("rf23_temporal_fuzz", {
      (s, dir) =>
        val spec = Seq(ColSpec("t1", CTs, 20), ColSpec("t2", CTs, 40),
          ColSpec("k", CInt, 10))
        sortAll(RandFrame.df(s, 120, 17001L, spec: _*).select(
          col("k"), col("t1"), col("t2"),
          (col("t1") + expr("INTERVAL 1 DAY")).as("plus_d"),
          date_trunc("HOUR", col("t1")).as("tr_h"),
          dayofweek(col("t1")).cast("long").as("dow"),
          expr("CAST((unix_micros(CAST(greatest(t1, t2) AS TIMESTAMP))" +
            " - unix_micros(CAST(least(t1, t2) AS TIMESTAMP)))" +
            " div 60000000 AS BIGINT)").as("mins_between"),
          greatest(col("t1"), col("t2")).as("tmax")))
    },
      Some {
        val spec = Seq(ColSpec("t1", CTs, 20), ColSpec("t2", CTs, 40),
          ColSpec("k", CInt, 10))
        s"""SELECT k, t1, t2,
           | t1 + INTERVAL 1 DAY AS plus_d,
           | date_trunc('hour', t1) AS tr_h,
           | CAST(dayofweek(t1) + 1 AS BIGINT) AS dow,
           | CAST((epoch_us(greatest(t1, t2)) - epoch_us(least(t1, t2)))
           |      // 60000000 AS BIGINT) AS mins_between,
           | greatest(t1, t2) AS tmax
           |FROM ${RandFrame.valuesSql(120, 17001L, spec: _*)} _t
           |${orderAll("k", "t1", "t2", "plus_d", "tr_h", "dow",
                "mins_between", "tmax")}""".stripMargin
      }),

    // distinct aggregates fuzz — COUNT/SUM(DISTINCT) take the
    // Expand-based plan path, a different execution shape from rf13's
    // plain aggregation
    Q("rf22_distinct_aggs", {
      (s, dir) =>
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CInt, 20),
          ColSpec("c", CInt, 20))
        Frame(RandFrame.df(s, 100, 16001L, spec: _*))
          .groupAgg(Seq("a"),
            "nd_b" -> countDistinct(col("b")),
            "sd_c" -> sum_distinct(col("c")),
            "n" -> count(lit(1)))
          .df.orderBy(asc_nulls_first("a"))
    },
      Some {
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CInt, 20),
          ColSpec("c", CInt, 20))
        s"""SELECT a, COUNT(DISTINCT b) AS nd_b,
           | CAST(SUM(DISTINCT c) AS BIGINT) AS sd_c, COUNT(*) AS n
           |FROM ${RandFrame.valuesSql(100, 16001L, spec: _*)} _t
           |GROUP BY a ORDER BY a NULLS FIRST""".stripMargin
      }),

    // rollup fuzz: NULL group keys vs subtotal NULLs are only
    // distinguishable via GROUPING() — both engines must agree on the
    // indicator AND the aggregate at every level
    Q("rf21_rollup_fuzz", {
      (s, dir) =>
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CStr, 30),
          ColSpec("c", CInt, 10))
        RandFrame.df(s, 100, 15001L, spec: _*)
          .rollup("a", "b")
          .agg(count(lit(1)).as("cnt"), sum("c").as("sum_c"),
            grouping_id(col("a"), col("b")).as("gid"))
          .orderBy(asc_nulls_first("gid"), asc_nulls_first("a"),
            asc_nulls_first("b"))
    },
      Some {
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CStr, 30),
          ColSpec("c", CInt, 10))
        s"""SELECT a, b, COUNT(*) AS cnt, CAST(SUM(c) AS BIGINT) AS sum_c,
           | CAST(GROUPING(a, b) AS BIGINT) AS gid
           |FROM ${RandFrame.valuesSql(100, 15001L, spec: _*)} _t
           |GROUP BY ROLLUP (a, b)
           |ORDER BY gid NULLS FIRST, a NULLS FIRST, b NULLS FIRST""".stripMargin
      }),

    // lag/lead fuzz — tie-safe because the window ORDER BY covers every
    // non-partition column: tied sort keys then mean fully identical
    // rows, so the output multiset is unique regardless of tiebreak
    Q("rf20_window_nav", {
      (s, dir) =>
        val spec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CFloat, 10),
          ColSpec("c", CStr, 10))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("a"))
          .orderBy(asc_nulls_first("b"), asc_nulls_first("c"))
        sortAll(RandFrame.df(s, 100, 14001L, spec: _*).select(
          col("a"), col("b"), col("c"),
          lag(col("b"), 1).over(w).as("prev_b"),
          lead(col("b"), 1).over(w).as("next_b"),
          lag(col("c"), 2, "none").over(w).as("prev2_c")))
    },
      Some {
        val spec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CFloat, 10),
          ColSpec("c", CStr, 10))
        s"""SELECT a, b, c,
           | LAG(b, 1) OVER w AS prev_b,
           | LEAD(b, 1) OVER w AS next_b,
           | LAG(c, 2, 'none') OVER w AS prev2_c
           |FROM ${RandFrame.valuesSql(100, 14001L, spec: _*)} _t
           |WINDOW w AS (PARTITION BY a ORDER BY b NULLS FIRST, c NULLS FIRST)
           |${orderAll("a", "b", "c", "prev_b", "next_b", "prev2_c")}""".stripMargin
      }),

    // cast-matrix fuzz: numeric-shaped strings (int/float/sci text,
    // 'naN', garbage, empty) through the SqlCast kernel — the
    // reference's most test-covered surface (§2.3) at fuzz density.
    // Oracle replicates the reference semantics exactly as e12 does:
    // via-double truncation for integral targets, naN→NULL,
    // invalid→NULL.
    Q("rf19_cast_fuzz", {
      (s, dir) =>
        import graft.functions.SqlCast
        import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
        val spec = Seq(ColSpec("v", CNumStr, 15))
        sortAll(RandFrame.df(s, 120, 13001L, spec: _*).select(
          col("v"),
          SqlCast.to(col("v"), StringType, LongType).as("as_long"),
          SqlCast.to(col("v"), StringType, IntegerType).as("as_int"),
          SqlCast.to(col("v"), StringType, DoubleType).as("as_double")))
    },
      Some {
        val spec = Seq(ColSpec("v", CNumStr, 15))
        s"""SELECT v,
           | CAST(TRUNC(CASE WHEN lower(v) = 'nan' THEN NULL
           |   ELSE TRY_CAST(v AS DOUBLE) END) AS BIGINT) AS as_long,
           | CAST(TRUNC(CASE WHEN lower(v) = 'nan' THEN NULL
           |   ELSE TRY_CAST(v AS DOUBLE) END) AS INTEGER) AS as_int,
           | CASE WHEN lower(v) = 'nan' THEN NULL
           |   ELSE TRY_CAST(v AS DOUBLE) END AS as_double
           |FROM ${RandFrame.valuesSql(120, 13001L, spec: _*)} _t
           |${orderAll("v", "as_long", "as_int", "as_double")}""".stripMargin
      }),

    // name-based union with NULL fill for missing columns, fuzzed —
    // DuckDB's UNION ALL BY NAME is the exact oracle semantics
    Q("rf18_union_byname", {
      (s, dir) =>
        val xSpec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CStr, 20))
        val ySpec = Seq(ColSpec("b", CStr, 10), ColSpec("a", CInt, 10),
          ColSpec("extra", CFloat, 10))
        val x = RandFrame.df(s, 50, 12001L, xSpec: _*)
        val y = RandFrame.df(s, 50, 12002L, ySpec: _*)
        sortAll(x.unionByName(y, allowMissingColumns = true))
    },
      Some {
        val xSpec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CStr, 20))
        val ySpec = Seq(ColSpec("b", CStr, 10), ColSpec("a", CInt, 10),
          ColSpec("extra", CFloat, 10))
        s"""SELECT a, b, extra FROM (
           | SELECT * FROM ${RandFrame.valuesSql(50, 12001L, xSpec: _*)} _x
           | UNION ALL BY NAME
           | SELECT * FROM ${RandFrame.valuesSql(50, 12002L, ySpec: _*)} _y)
           |${orderAll("a", "b", "extra")}""".stripMargin
      }),

    // non-unique intersect/except (reference semantics: keep df1's
    // duplicate rows by existence against dedup'd df2, NULLs compare
    // equal) — fuzzes the null-safe existence-join path
    Q("rf17_setops_dups", {
      (s, dir) =>
        val spec = Seq(ColSpec("b", CInt, 40), ColSpec("c", CStr, 40))
        val x = Frame(RandFrame.df(s, 80, 11001L, spec: _*))
        val y = Frame(RandFrame.df(s, 80, 11002L, spec: _*))
        sortAll(x.intersect(y, unique = false).df
          .withColumn("op", lit("i"))
          .unionByName(x.except(y, unique = false).df
            .withColumn("op", lit("e"))))
    },
      Some {
        val spec = Seq(ColSpec("b", CInt, 40), ColSpec("c", CStr, 40))
        val xs = RandFrame.valuesSql(80, 11001L, spec: _*)
        val ys = RandFrame.valuesSql(80, 11002L, spec: _*)
        s"""SELECT b, c, op FROM (
           | SELECT b, c, 'i' AS op FROM $xs x
           | WHERE EXISTS (SELECT 1 FROM $ys y
           |   WHERE y.b IS NOT DISTINCT FROM x.b
           |     AND y.c IS NOT DISTINCT FROM x.c)
           | UNION ALL
           | SELECT b, c, 'e' AS op FROM $xs x
           | WHERE NOT EXISTS (SELECT 1 FROM $ys y
           |   WHERE y.b IS NOT DISTINCT FROM x.b
           |     AND y.c IS NOT DISTINCT FROM x.c))
           |${orderAll("b", "c", "op")}""".stripMargin
      }),

    // as-of join fuzz vs DuckDB's native ASOF JOIN. The right side is
    // pre-aggregated to one row per (key, time) — with duplicate right
    // times "latest value" is undefined in both engines, so the dedup
    // is part of the operator contract here, mirrored in the oracle.
    Q("rf16_asof_join", {
      (s, dir) =>
        val lSpec = Seq(ColSpec("k", CInt, 0), ColSpec("lt", CInt, 0),
          ColSpec("payload", CFloat, 10))
        val rSpec = Seq(ColSpec("k", CInt, 0), ColSpec("rt", CInt, 0),
          ColSpec("rv", CInt, 5))
        val left = RandFrame.df(s, 60, 10001L, lSpec: _*)
        val right = RandFrame.df(s, 40, 10002L, rSpec: _*)
          .groupBy("k", "rt").agg(max("rv").as("rv"))
        graft.operators.AsOf.join(left, right, "k", "lt", "rt", "rv")
          .orderBy(asc_nulls_first("k"), asc_nulls_first("lt"),
            asc_nulls_first("payload"))
    },
      Some {
        val lSpec = Seq(ColSpec("k", CInt, 0), ColSpec("lt", CInt, 0),
          ColSpec("payload", CFloat, 10))
        val rSpec = Seq(ColSpec("k", CInt, 0), ColSpec("rt", CInt, 0),
          ColSpec("rv", CInt, 5))
        s"""SELECT l.k, l.lt, l.payload, r.rv AS asof_rv
           |FROM ${RandFrame.valuesSql(60, 10001L, lSpec: _*)} l
           |ASOF LEFT JOIN (
           | SELECT k, rt, CAST(MAX(rv) AS BIGINT) AS rv
           | FROM ${RandFrame.valuesSql(40, 10002L, rSpec: _*)} _r
           | GROUP BY k, rt) r
           | ON l.k = r.k AND r.rt <= l.lt
           |ORDER BY l.k NULLS FIRST, l.lt NULLS FIRST, l.payload NULLS FIRST""".stripMargin
      }),

    // CASE WHEN with bool branches over random strings (suite:853-902)
    Q("rf12_casewhen", {
      (s, dir) =>
        val spec = Seq(ColSpec("a", CBool, 0), ColSpec("b", CStr, 0),
          ColSpec("c", CBool, 5), ColSpec("d", CStr, 10), ColSpec("e", CStr, 10))
        sortAll(RandFrame.df(s, 20, 6001L, spec: _*).select(
          col("a"), col("b"), col("c"), col("d"), col("e"),
          Kernels.caseWhen(
            Seq((col("a"): Column) -> col("b"), (col("c"): Column) -> col("d")),
            col("e")).as("cw")))
    },
      Some {
        val spec = Seq(ColSpec("a", CBool, 0), ColSpec("b", CStr, 0),
          ColSpec("c", CBool, 5), ColSpec("d", CStr, 10), ColSpec("e", CStr, 10))
        s"""SELECT a, b, c, d, e,
           | CASE WHEN a THEN b WHEN c THEN d ELSE e END AS cw
           |FROM ${RandFrame.valuesSql(20, 6001L, spec: _*)} _t
           |${orderAll("a", "b", "c", "d", "e", "cw")}""".stripMargin
      })
  )
}
