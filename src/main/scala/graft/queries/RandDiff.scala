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
  * Every shape runs a SEED MATRIX, not one draw: the reference's safety
  * net is the suite invoked across many frames, so each query here is
  * the UNION of [[seedOffsets]].size independent seed-shifted instances
  * tagged with a `seedoff` column, and the oracle unions the matching
  * VALUES subqueries. Offset 0 reproduces the original round-2 data
  * exactly; a regression in any seed flips the whole row-hash red.
  *
  * Canonical invocations follow FIXTURES.md §A1 / suite:653-2566.
  */
object RandDiff {

  /** the seed matrix: each shape instantiates once per offset */
  private val seedOffsets: Seq[Long] = Seq(0L, 100L, 200L, 300L, 400L)

  /** One fuzz shape = a frame builder and oracle SQL, both seed-shifted.
    * `ordCols` is the total ordering WITHIN one seed instance (the same
    * columns the single-seed query ordered by); `seedoff` is prepended
    * so the union stays totally ordered.
    */
  private def multi(name: String, ordCols: Seq[String],
      build: (SparkSession, Long) => DataFrame,
      sql: Long => String): Q = {
    Q(name,
      (s, dir) => seedOffsets
        .map(off => build(s, off).withColumn("seedoff", lit(off)))
        .reduce(_.unionByName(_))
        .orderBy((col("seedoff") +: ordCols.map(asc_nulls_first)).toIndexedSeq: _*),
      Some {
        val union = seedOffsets
          .map(off => s"SELECT *, CAST($off AS BIGINT) AS seedoff FROM (\n${sql(off)}\n) _s$off")
          .mkString("\nUNION ALL\n")
        s"""SELECT * FROM (
           |$union
           |) ORDER BY seedoff, ${ordCols.map(c => s"$c NULLS FIRST").mkString(", ")}""".stripMargin
      })
  }

  // ---- frame specs (canonical invocations) ----

  // joins (suite:2468-2566): x=100 rows 40% null keys, y=80 rows 10%
  private val jx = Seq(ColSpec("a", CInt, 40), ColSpec("b", CDateTime, 40),
    ColSpec("c", CFloat, 40))
  private val jy = Seq(ColSpec("d", CFloat, 10), ColSpec("a", CInt, 10),
    ColSpec("b", CDateTime, 10))

  // set-op triple (suite:2230-2346): 30/80/100 rows, half-null tails;
  // the middle frame's names differ to prove positional alignment
  private val sx = Seq(ColSpec("b", CInt, 10), ColSpec("c", CStr, 10),
    ColSpec("d", CDateTime, 10))
  private val sy = Seq(ColSpec("q", CInt, 50), ColSpec("r", CStr, 50),
    ColSpec("s", CDateTime, 50))
  private val sz = Seq(ColSpec("b", CInt, 50), ColSpec("c", CStr, 50),
    ColSpec("d", CDateTime, 50))

  private def jxDf(s: SparkSession, off: Long) = RandFrame.df(s, 100, 1001L + off, jx: _*)
  private def jyDf(s: SparkSession, off: Long) = RandFrame.df(s, 80, 1002L + off, jy: _*)
  private def jxSql(off: Long) = RandFrame.valuesSql(100, 1001L + off, jx: _*)
  private def jySql(off: Long) = RandFrame.valuesSql(80, 1002L + off, jy: _*)

  private def sxDf(s: SparkSession, off: Long) = RandFrame.df(s, 30, 2001L + off, sx: _*)
  private def syDf(s: SparkSession, off: Long) = RandFrame.df(s, 80, 2002L + off, sy: _*)
  private def szDf(s: SparkSession, off: Long) = RandFrame.df(s, 100, 2003L + off, sz: _*)
  private def sxSql(off: Long) = RandFrame.valuesSql(30, 2001L + off, sx: _*)
  private def sySql(off: Long) = RandFrame.valuesSql(80, 2002L + off, sy: _*)
  private def szSql(off: Long) = RandFrame.valuesSql(100, 2003L + off, sz: _*)

  def all: Seq[Q] = Seq(

    multi("rf1_join_inner", Seq("a", "b", "c", "d"),
      (s, off) => Frame(jxDf(s, off)).join(Frame(jyDf(s, off)), "inner", Seq("a", "b")).df,
      off => s"""SELECT x.a, x.b, x.c, y.d
                |FROM ${jxSql(off)} x JOIN ${jySql(off)} y ON x.a = y.a AND x.b = y.b""".stripMargin),

    multi("rf2_join_left", Seq("a", "b", "c", "d"),
      (s, off) => Frame(jxDf(s, off)).join(Frame(jyDf(s, off)), "left", Seq("a", "b")).df,
      off => s"""SELECT x.a, x.b, x.c, y.d
                |FROM ${jxSql(off)} x LEFT JOIN ${jySql(off)} y ON x.a = y.a AND x.b = y.b""".stripMargin),

    multi("rf3_join_full", Seq("a", "b", "c", "d"),
      (s, off) => Frame(jxDf(s, off)).join(Frame(jyDf(s, off)), "full", Seq("a", "b")).df,
      off => s"""SELECT COALESCE(x.a, y.a) AS a, COALESCE(x.b, y.b) AS b, x.c, y.d
                |FROM ${jxSql(off)} x FULL JOIN ${jySql(off)} y ON x.a = y.a AND x.b = y.b""".stripMargin),

    multi("rf4_join_semi", Seq("a", "b", "c"),
      (s, off) => Frame(jxDf(s, off)).join(Frame(jyDf(s, off)), "semi", Seq("a", "b")).df,
      off => s"""SELECT x.a, x.b, x.c FROM ${jxSql(off)} x
                |WHERE EXISTS (SELECT 1 FROM ${jySql(off)} y WHERE y.a = x.a AND y.b = x.b)""".stripMargin),

    multi("rf5_join_anti", Seq("a", "b", "c"),
      (s, off) => Frame(jxDf(s, off)).join(Frame(jyDf(s, off)), "anti", Seq("a", "b")).df,
      off => s"""SELECT x.a, x.b, x.c FROM ${jxSql(off)} x
                |WHERE NOT EXISTS (SELECT 1 FROM ${jySql(off)} y WHERE y.a = x.a AND y.b = x.b)""".stripMargin),

    // (x UNION ALL y) UNION z — y's columns align positionally
    multi("rf6_union_triple", Seq("b", "c", "d"),
      (s, off) => Frame(sxDf(s, off)).union(Frame(syDf(s, off)))
        .union(Frame(szDf(s, off)), unique = true).df,
      off => s"""SELECT b, c, d FROM (
                | SELECT * FROM (
                |  SELECT b, c, d FROM ${sxSql(off)} _x
                |  UNION ALL
                |  SELECT q AS b, r AS c, s AS d FROM ${sySql(off)} _y) _u
                | UNION
                | SELECT b, c, d FROM ${szSql(off)} _z)""".stripMargin),

    multi("rf7_intersect_triple", Seq("b", "c", "d"),
      (s, off) => Frame(sxDf(s, off)).union(Frame(syDf(s, off)))
        .intersect(Frame(szDf(s, off)), unique = true).df,
      off => s"""SELECT b, c, d FROM (
                | SELECT b, c, d FROM (
                |  SELECT b, c, d FROM ${sxSql(off)} _x
                |  UNION ALL
                |  SELECT q AS b, r AS c, s AS d FROM ${sySql(off)} _y) _u
                | INTERSECT
                | SELECT b, c, d FROM ${szSql(off)} _z)""".stripMargin),

    multi("rf8_except_triple", Seq("b", "c", "d"),
      (s, off) => Frame(sxDf(s, off)).union(Frame(syDf(s, off)))
        .except(Frame(szDf(s, off)), unique = true).df,
      off => s"""SELECT b, c, d FROM (
                | SELECT b, c, d FROM (
                |  SELECT b, c, d FROM ${sxSql(off)} _x
                |  UNION ALL
                |  SELECT q AS b, r AS c, s AS d FROM ${sySql(off)} _y) _u
                | EXCEPT
                | SELECT b, c, d FROM ${szSql(off)} _z)""".stripMargin),

    // DISTINCT over half-null int pairs (suite:2164-2193)
    multi("rf9_distinct", Seq("a", "b"),
      (s, off) => Frame(
        RandFrame.df(s, 100, 3001L + off, ColSpec("a", CInt, 50), ColSpec("b", CInt, 50)))
        .dropDuplicates().df,
      off => s"""SELECT DISTINCT a, b
                |FROM ${RandFrame.valuesSql(100, 3001L + off, ColSpec("a", CInt, 50), ColSpec("b", CInt, 50))} _t""".stripMargin),

    // COALESCE over half-null columns of every scalar type (suite:694-816)
    multi("rf10_coalesce", Seq("fl", "it", "st", "dt"), {
      (s, off) =>
        val spec = Seq(ColSpec("a", CFloat, 50), ColSpec("b", CFloat, 50),
          ColSpec("c", CFloat, 50), ColSpec("d", CInt, 50), ColSpec("e", CInt, 50),
          ColSpec("f", CStr, 50), ColSpec("g", CStr, 50),
          ColSpec("h", CDateTime, 50), ColSpec("i", CDateTime, 50))
        RandFrame.df(s, 100, 4001L + off, spec: _*).select(
          coalesce(col("a"), col("b"), col("c")).as("fl"),
          coalesce(col("d"), col("e")).as("it"),
          coalesce(col("f"), col("g")).as("st"),
          coalesce(col("h"), col("i")).as("dt"))
    },
      { off =>
        val spec = Seq(ColSpec("a", CFloat, 50), ColSpec("b", CFloat, 50),
          ColSpec("c", CFloat, 50), ColSpec("d", CInt, 50), ColSpec("e", CInt, 50),
          ColSpec("f", CStr, 50), ColSpec("g", CStr, 50),
          ColSpec("h", CDateTime, 50), ColSpec("i", CDateTime, 50))
        s"""SELECT COALESCE(a, b, c) AS fl, COALESCE(d, e) AS it,
           | COALESCE(f, g) AS st, COALESCE(h, i) AS dt
           |FROM ${RandFrame.valuesSql(100, 4001L + off, spec: _*)} _t""".stripMargin
      }),

    // BETWEEN 3VL over random NULL patterns (suite:653)
    multi("rf11_between", Seq("a", "b", "c", "btw", "nbtw"), {
      (s, off) =>
        val spec = Seq(ColSpec("a", CFloat, 20), ColSpec("b", CFloat, 20),
          ColSpec("c", CFloat, 20))
        RandFrame.df(s, 100, 5001L + off, spec: _*).select(
          col("a"), col("b"), col("c"),
          Kernels.isBetween(col("a"), col("b"), col("c"), positive = true).as("btw"),
          Kernels.isBetween(col("a"), col("b"), col("c"), positive = false).as("nbtw"))
    },
      { off =>
        val spec = Seq(ColSpec("a", CFloat, 20), ColSpec("b", CFloat, 20),
          ColSpec("c", CFloat, 20))
        s"""SELECT a, b, c, a >= b AND a <= c AS btw,
           | NOT (a >= b AND a <= c) AS nbtw
           |FROM ${RandFrame.valuesSql(100, 5001L + off, spec: _*)} _t""".stripMargin
      }),

    // groupBy-agg with NULL keys over random frames (suite:2020-2153's
    // group semantics at fuzz density). Float columns only pass through
    // min/max/count — never SUM/AVG, whose result depends on summation
    // order once values are off the exact-integer grid.
    multi("rf13_groupby_agg", Seq("a"), {
      (s, off) =>
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CFloat, 20),
          ColSpec("c", CInt, 20))
        Frame(RandFrame.df(s, 100, 7001L + off, spec: _*))
          .groupAgg(Seq("a"),
            "cnt" -> count(lit(1)),
            "cnt_b" -> count(col("b")),
            "sum_c" -> sum(col("c")),
            "min_b" -> min(col("b")),
            "max_b" -> max(col("b")))
          .df
    },
      { off =>
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CFloat, 20),
          ColSpec("c", CInt, 20))
        s"""SELECT a, COUNT(*) AS cnt, COUNT(b) AS cnt_b,
           | CAST(SUM(c) AS BIGINT) AS sum_c,
           | MIN(b) AS min_b, MAX(b) AS max_b
           |FROM ${RandFrame.valuesSql(100, 7001L + off, spec: _*)} _t
           |GROUP BY a""".stripMargin
      }),

    // rank-family windows over random NULL patterns: rank/dense_rank/
    // percent_rank are value-determined (safe under ties), row_number is
    // not — deliberately absent
    multi("rf14_window_rank", Seq("a", "b", "rk", "drk", "prk"), {
      (s, off) =>
        val spec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CFloat, 10))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("a")).orderBy(asc_nulls_first("b"))
        RandFrame.df(s, 100, 8001L + off, spec: _*).select(
          col("a"), col("b"),
          rank().over(w).cast(org.apache.spark.sql.types.LongType).as("rk"),
          dense_rank().over(w).cast(org.apache.spark.sql.types.LongType).as("drk"),
          percent_rank().over(w).as("prk"))
    },
      { off =>
        val spec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CFloat, 10))
        s"""SELECT a, b,
           | CAST(RANK() OVER w AS BIGINT) AS rk,
           | CAST(DENSE_RANK() OVER w AS BIGINT) AS drk,
           | PERCENT_RANK() OVER w AS prk
           |FROM ${RandFrame.valuesSql(100, 8001L + off, spec: _*)} _t
           |WINDOW w AS (PARTITION BY a ORDER BY b NULLS FIRST)""".stripMargin
      }),

    // group-apply (flatMapGroups) over random NULL-key groups: per-group
    // closure logic checked against a group-agg oracle — NULL keys form a
    // group like any other (suite:2020-2153 at fuzz density). Ints are
    // the only payload so the closure's arithmetic is exact.
    multi("rf15_group_apply", Seq("a"), {
      (s, off) =>
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
        Frame(RandFrame.df(s, 100, 9001L + off, spec: _*))
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
          }.df
    },
      { off =>
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CInt, 10),
          ColSpec("c", CStr, 10))
        s"""SELECT a, COUNT(*) AS n, CAST(SUM(b) AS BIGINT) AS b_sum,
           | MAX(c) AS c_max
           |FROM ${RandFrame.valuesSql(100, 9001L + off, spec: _*)} _t
           |GROUP BY a""".stripMargin
      }),

    // temporal fuzz: interval add, hour-truncation, dow, minute spans
    // and greatest/least over minute-granularity timestamps at 17–33%
    // null density. mins_between goes through greatest-least so the
    // dividend is non-negative (Spark `div` truncates toward zero,
    // DuckDB `//` floors — they only agree on non-negatives; minute
    // granularity additionally makes the division exact).
    multi("rf23_temporal_fuzz",
      Seq("k", "t1", "t2", "plus_d", "tr_h", "dow", "mins_between", "tmax"), {
      (s, off) =>
        val spec = Seq(ColSpec("t1", CTs, 20), ColSpec("t2", CTs, 40),
          ColSpec("k", CInt, 10))
        RandFrame.df(s, 120, 17001L + off, spec: _*).select(
          col("k"), col("t1"), col("t2"),
          (col("t1") + expr("INTERVAL 1 DAY")).as("plus_d"),
          date_trunc("HOUR", col("t1")).as("tr_h"),
          dayofweek(col("t1")).cast("long").as("dow"),
          expr("CAST((unix_micros(CAST(greatest(t1, t2) AS TIMESTAMP))" +
            " - unix_micros(CAST(least(t1, t2) AS TIMESTAMP)))" +
            " div 60000000 AS BIGINT)").as("mins_between"),
          greatest(col("t1"), col("t2")).as("tmax"))
    },
      { off =>
        val spec = Seq(ColSpec("t1", CTs, 20), ColSpec("t2", CTs, 40),
          ColSpec("k", CInt, 10))
        s"""SELECT k, t1, t2,
           | t1 + INTERVAL 1 DAY AS plus_d,
           | date_trunc('hour', t1) AS tr_h,
           | CAST(dayofweek(t1) + 1 AS BIGINT) AS dow,
           | CAST((epoch_us(greatest(t1, t2)) - epoch_us(least(t1, t2)))
           |      // 60000000 AS BIGINT) AS mins_between,
           | greatest(t1, t2) AS tmax
           |FROM ${RandFrame.valuesSql(120, 17001L + off, spec: _*)} _t""".stripMargin
      }),

    // distinct aggregates fuzz — COUNT/SUM(DISTINCT) take the
    // Expand-based plan path, a different execution shape from rf13's
    // plain aggregation
    multi("rf22_distinct_aggs", Seq("a"), {
      (s, off) =>
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CInt, 20),
          ColSpec("c", CInt, 20))
        Frame(RandFrame.df(s, 100, 16001L + off, spec: _*))
          .groupAgg(Seq("a"),
            "nd_b" -> countDistinct(col("b")),
            "sd_c" -> sum_distinct(col("c")),
            "n" -> count(lit(1)))
          .df
    },
      { off =>
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CInt, 20),
          ColSpec("c", CInt, 20))
        s"""SELECT a, COUNT(DISTINCT b) AS nd_b,
           | CAST(SUM(DISTINCT c) AS BIGINT) AS sd_c, COUNT(*) AS n
           |FROM ${RandFrame.valuesSql(100, 16001L + off, spec: _*)} _t
           |GROUP BY a""".stripMargin
      }),

    // rollup fuzz: NULL group keys vs subtotal NULLs are only
    // distinguishable via GROUPING() — both engines must agree on the
    // indicator AND the aggregate at every level
    multi("rf21_rollup_fuzz", Seq("gid", "a", "b"), {
      (s, off) =>
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CStr, 30),
          ColSpec("c", CInt, 10))
        RandFrame.df(s, 100, 15001L + off, spec: _*)
          .rollup("a", "b")
          .agg(count(lit(1)).as("cnt"), sum("c").as("sum_c"),
            grouping_id(col("a"), col("b")).as("gid"))
    },
      { off =>
        val spec = Seq(ColSpec("a", CInt, 30), ColSpec("b", CStr, 30),
          ColSpec("c", CInt, 10))
        s"""SELECT a, b, COUNT(*) AS cnt, CAST(SUM(c) AS BIGINT) AS sum_c,
           | CAST(GROUPING(a, b) AS BIGINT) AS gid
           |FROM ${RandFrame.valuesSql(100, 15001L + off, spec: _*)} _t
           |GROUP BY ROLLUP (a, b)""".stripMargin
      }),

    // lag/lead fuzz — tie-safe because the window ORDER BY covers every
    // non-partition column: tied sort keys then mean fully identical
    // rows, so the output multiset is unique regardless of tiebreak
    multi("rf20_window_nav", Seq("a", "b", "c", "prev_b", "next_b", "prev2_c"), {
      (s, off) =>
        val spec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CFloat, 10),
          ColSpec("c", CStr, 10))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("a"))
          .orderBy(asc_nulls_first("b"), asc_nulls_first("c"))
        RandFrame.df(s, 100, 14001L + off, spec: _*).select(
          col("a"), col("b"), col("c"),
          lag(col("b"), 1).over(w).as("prev_b"),
          lead(col("b"), 1).over(w).as("next_b"),
          lag(col("c"), 2, "none").over(w).as("prev2_c"))
    },
      { off =>
        val spec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CFloat, 10),
          ColSpec("c", CStr, 10))
        s"""SELECT a, b, c,
           | LAG(b, 1) OVER w AS prev_b,
           | LEAD(b, 1) OVER w AS next_b,
           | LAG(c, 2, 'none') OVER w AS prev2_c
           |FROM ${RandFrame.valuesSql(100, 14001L + off, spec: _*)} _t
           |WINDOW w AS (PARTITION BY a ORDER BY b NULLS FIRST, c NULLS FIRST)""".stripMargin
      }),

    // cast-matrix fuzz: numeric-shaped strings (int/float/sci text,
    // 'naN', garbage, empty) through the SqlCast kernel — the
    // reference's most test-covered surface (§2.3) at fuzz density.
    // Oracle replicates the reference semantics exactly as e12 does:
    // via-double truncation for integral targets, naN→NULL,
    // invalid→NULL.
    multi("rf19_cast_fuzz", Seq("v", "as_long", "as_int", "as_double"), {
      (s, off) =>
        import graft.functions.SqlCast
        import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}
        val spec = Seq(ColSpec("v", CNumStr, 15))
        RandFrame.df(s, 120, 13001L + off, spec: _*).select(
          col("v"),
          SqlCast.to(col("v"), StringType, LongType).as("as_long"),
          SqlCast.to(col("v"), StringType, IntegerType).as("as_int"),
          SqlCast.to(col("v"), StringType, DoubleType).as("as_double"))
    },
      { off =>
        val spec = Seq(ColSpec("v", CNumStr, 15))
        s"""SELECT v,
           | CAST(TRUNC(CASE WHEN lower(v) = 'nan' THEN NULL
           |   ELSE TRY_CAST(v AS DOUBLE) END) AS BIGINT) AS as_long,
           | CAST(TRUNC(CASE WHEN lower(v) = 'nan' THEN NULL
           |   ELSE TRY_CAST(v AS DOUBLE) END) AS INTEGER) AS as_int,
           | CASE WHEN lower(v) = 'nan' THEN NULL
           |   ELSE TRY_CAST(v AS DOUBLE) END AS as_double
           |FROM ${RandFrame.valuesSql(120, 13001L + off, spec: _*)} _t""".stripMargin
      }),

    // name-based union with NULL fill for missing columns, fuzzed —
    // DuckDB's UNION ALL BY NAME is the exact oracle semantics
    multi("rf18_union_byname", Seq("a", "b", "extra"), {
      (s, off) =>
        val xSpec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CStr, 20))
        val ySpec = Seq(ColSpec("b", CStr, 10), ColSpec("a", CInt, 10),
          ColSpec("extra", CFloat, 10))
        val x = RandFrame.df(s, 50, 12001L + off, xSpec: _*)
        val y = RandFrame.df(s, 50, 12002L + off, ySpec: _*)
        x.unionByName(y, allowMissingColumns = true)
    },
      { off =>
        val xSpec = Seq(ColSpec("a", CInt, 20), ColSpec("b", CStr, 20))
        val ySpec = Seq(ColSpec("b", CStr, 10), ColSpec("a", CInt, 10),
          ColSpec("extra", CFloat, 10))
        s"""SELECT a, b, extra FROM (
           | SELECT * FROM ${RandFrame.valuesSql(50, 12001L + off, xSpec: _*)} _x
           | UNION ALL BY NAME
           | SELECT * FROM ${RandFrame.valuesSql(50, 12002L + off, ySpec: _*)} _y)""".stripMargin
      }),

    // non-unique intersect/except (reference semantics: keep df1's
    // duplicate rows by existence against dedup'd df2, NULLs compare
    // equal) — fuzzes the null-safe existence-join path
    multi("rf17_setops_dups", Seq("b", "c", "op"), {
      (s, off) =>
        val spec = Seq(ColSpec("b", CInt, 40), ColSpec("c", CStr, 40))
        val x = Frame(RandFrame.df(s, 80, 11001L + off, spec: _*))
        val y = Frame(RandFrame.df(s, 80, 11002L + off, spec: _*))
        x.intersect(y, unique = false).df
          .withColumn("op", lit("i"))
          .unionByName(x.except(y, unique = false).df
            .withColumn("op", lit("e")))
    },
      { off =>
        val spec = Seq(ColSpec("b", CInt, 40), ColSpec("c", CStr, 40))
        val xs = RandFrame.valuesSql(80, 11001L + off, spec: _*)
        val ys = RandFrame.valuesSql(80, 11002L + off, spec: _*)
        s"""SELECT b, c, op FROM (
           | SELECT b, c, 'i' AS op FROM $xs x
           | WHERE EXISTS (SELECT 1 FROM $ys y
           |   WHERE y.b IS NOT DISTINCT FROM x.b
           |     AND y.c IS NOT DISTINCT FROM x.c)
           | UNION ALL
           | SELECT b, c, 'e' AS op FROM $xs x
           | WHERE NOT EXISTS (SELECT 1 FROM $ys y
           |   WHERE y.b IS NOT DISTINCT FROM x.b
           |     AND y.c IS NOT DISTINCT FROM x.c))""".stripMargin
      }),

    // as-of join fuzz vs DuckDB's native ASOF JOIN. The right side is
    // pre-aggregated to one row per (key, time) — with duplicate right
    // times "latest value" is undefined in both engines, so the dedup
    // is part of the operator contract here, mirrored in the oracle.
    multi("rf16_asof_join", Seq("k", "lt", "payload"), {
      (s, off) =>
        val lSpec = Seq(ColSpec("k", CInt, 0), ColSpec("lt", CInt, 0),
          ColSpec("payload", CFloat, 10))
        val rSpec = Seq(ColSpec("k", CInt, 0), ColSpec("rt", CInt, 0),
          ColSpec("rv", CInt, 5))
        val left = RandFrame.df(s, 60, 10001L + off, lSpec: _*)
        val right = RandFrame.df(s, 40, 10002L + off, rSpec: _*)
          .groupBy("k", "rt").agg(max("rv").as("rv"))
        graft.operators.AsOf.join(left, right, "k", "lt", "rt", "rv")
    },
      { off =>
        val lSpec = Seq(ColSpec("k", CInt, 0), ColSpec("lt", CInt, 0),
          ColSpec("payload", CFloat, 10))
        val rSpec = Seq(ColSpec("k", CInt, 0), ColSpec("rt", CInt, 0),
          ColSpec("rv", CInt, 5))
        s"""SELECT l.k, l.lt, l.payload, r.rv AS asof_rv
           |FROM ${RandFrame.valuesSql(60, 10001L + off, lSpec: _*)} l
           |ASOF LEFT JOIN (
           | SELECT k, rt, CAST(MAX(rv) AS BIGINT) AS rv
           | FROM ${RandFrame.valuesSql(40, 10002L + off, rSpec: _*)} _r
           | GROUP BY k, rt) r
           | ON l.k = r.k AND r.rt <= l.lt""".stripMargin
      }),

    // RANGE-frame windows at fuzz density (w6's shape): value-based
    // frame bounds over random ints. The order column carries no NULLs —
    // NULL peer-group semantics in RANGE frames is the one window corner
    // the engines define differently, and the operator contract here is
    // the numeric-bounds frame, not NULL ordering.
    multi("rf24_range_frame", Seq("g", "o", "v", "rsum", "rcnt"), {
      (s, off) =>
        val spec = Seq(ColSpec("g", CInt, 20), ColSpec("o", CInt, 0),
          ColSpec("v", CInt, 20))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("g")).orderBy(col("o")).rangeBetween(-2, 2)
        RandFrame.df(s, 100, 18001L + off, spec: _*).select(
          col("g"), col("o"), col("v"),
          sum("v").over(w).cast(org.apache.spark.sql.types.LongType).as("rsum"),
          count(col("v")).over(w).as("rcnt"))
    },
      { off =>
        val spec = Seq(ColSpec("g", CInt, 20), ColSpec("o", CInt, 0),
          ColSpec("v", CInt, 20))
        s"""SELECT g, o, v,
           | CAST(SUM(v) OVER w AS BIGINT) AS rsum,
           | CAST(COUNT(v) OVER w AS BIGINT) AS rcnt
           |FROM ${RandFrame.valuesSql(100, 18001L + off, spec: _*)} _t
           |WINDOW w AS (PARTITION BY g ORDER BY o
           |  RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING)""".stripMargin
      }),

    // resample + linear interpolation over random irregular series:
    // NULL keys (their grid never rejoins its observations — 3VL join),
    // NULL timestamps (bucket NULL drops from the grid in both engines),
    // NULL values (all-NULL buckets become gaps), keys whose rows are
    // all-NULL-ts (empty sequence → no grid) — 6-hour buckets over the
    // 10-day CTs span, ~40 buckets/key
    multi("rf25_resample_fuzz", Seq("k", "bucket", "value", "interpolated"), {
      (s, off) =>
        val spec = Seq(ColSpec("k", CInt, 10), ColSpec("t", CTs, 15),
          ColSpec("v", CFloat, 15))
        graft.operators.Timeseries.resample(
          RandFrame.df(s, 120, 26001L + off, spec: _*),
          "k", "t", "v", 21600000000L, "linear")
    },
      { off =>
        val spec = Seq(ColSpec("k", CInt, 10), ColSpec("t", CTs, 15),
          ColSpec("v", CFloat, 15))
        s"""WITH obs AS (
           | SELECT k, epoch_us(t) // 21600000000 AS bucket,
           |   SUM(CAST(ROUND(v*100) AS BIGINT)) / 100.0 / COUNT(*) AS ov
           | FROM ${RandFrame.valuesSql(120, 26001L + off, spec: _*)} _t
           | GROUP BY 1, 2),
           |grid AS (
           | SELECT k, UNNEST(generate_series(lo, hi)) AS bucket
           | FROM (SELECT k, MIN(bucket) AS lo, MAX(bucket) AS hi
           |       FROM obs GROUP BY 1)),
           |j AS (SELECT g.k, g.bucket, o.ov FROM grid g
           |      LEFT JOIN obs o ON g.k = o.k AND g.bucket = o.bucket),
           |f AS (SELECT k, bucket, ov,
           | LAST_VALUE(ov IGNORE NULLS) OVER wp AS pv,
           | LAST_VALUE(CASE WHEN ov IS NOT NULL THEN bucket END IGNORE NULLS) OVER wp AS pb,
           | FIRST_VALUE(ov IGNORE NULLS) OVER wf AS nv,
           | FIRST_VALUE(CASE WHEN ov IS NOT NULL THEN bucket END IGNORE NULLS) OVER wf AS nb
           | FROM j
           | WINDOW wp AS (PARTITION BY k ORDER BY bucket
           |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           | wf AS (PARTITION BY k ORDER BY bucket
           |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
           |SELECT k, bucket,
           | ROUND(CASE WHEN ov IS NOT NULL THEN ov
           |   WHEN pv IS NOT NULL AND nv IS NOT NULL
           |     THEN pv + (nv - pv) * (bucket - pb) / (nb - pb)
           |   ELSE COALESCE(pv, nv) END, 6) AS value,
           | (ov IS NULL) AS interpolated
           |FROM f""".stripMargin
      }),

    // Funnel fuzz: 400 events over 10 users and DAY-granularity
    // timestamps — heavy equal-ts collisions plus NULL users, the
    // adversarial inputs for sequential stage detection (stage k must be
    // STRICTLY after stage k-1; equal-ts events must never chain).
    // Stage is derived from an int column so both engines synthesize the
    // identical event stream.
    multi("rf26_funnel_fuzz", Seq("u"), {
      (s, off) =>
        val spec = Seq(ColSpec("u", CInt, 30), ColSpec("k", CInt, 0),
          ColSpec("t", CDateTime, 0))
        val ev = RandFrame.df(s, 400, 27001L + off, spec: _*)
          .withColumn("event_type", element_at(
            array(lit("signup"), lit("view"), lit("click"), lit("purchase")),
            (col("k") % 4 + 1).cast("int")))
        graft.operators.Funnel.funnel(ev, "u", "event_type", "t",
          Seq("signup", "view", "click", "purchase"))
    },
      { off =>
        val spec = Seq(ColSpec("u", CInt, 30), ColSpec("k", CInt, 0),
          ColSpec("t", CDateTime, 0))
        val values = RandFrame.valuesSql(400, 27001L + off, spec: _*)
        s"""WITH ev AS (
           | SELECT u, CASE k % 4 WHEN 0 THEN 'signup' WHEN 1 THEN 'view'
           |   WHEN 2 THEN 'click' ELSE 'purchase' END AS event_type, t
           | FROM $values _v),
           |s1 AS (SELECT u, MIN(t) AS t1 FROM ev
           |  WHERE event_type = 'signup' AND u IS NOT NULL GROUP BY 1),
           |s2 AS (SELECT e.u, MIN(e.t) AS t2 FROM ev e
           |  JOIN s1 ON e.u = s1.u AND e.t > s1.t1
           |  WHERE e.event_type = 'view' GROUP BY 1),
           |s3 AS (SELECT e.u, MIN(e.t) AS t3 FROM ev e
           |  JOIN s2 ON e.u = s2.u AND e.t > s2.t2
           |  WHERE e.event_type = 'click' GROUP BY 1),
           |s4 AS (SELECT e.u, MIN(e.t) AS t4 FROM ev e
           |  JOIN s3 ON e.u = s3.u AND e.t > s3.t3
           |  WHERE e.event_type = 'purchase' GROUP BY 1)
           |SELECT s1.u,
           | CAST(1 + CASE WHEN s2.u IS NOT NULL THEN 1 ELSE 0 END
           |   + CASE WHEN s3.u IS NOT NULL THEN 1 ELSE 0 END
           |   + CASE WHEN s4.u IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS stage_reached,
           | s1.t1 AS t_first,
           | COALESCE(s4.t4, s3.t3, s2.t2, s1.t1) AS t_last
           |FROM s1
           |LEFT JOIN s2 ON s1.u = s2.u
           |LEFT JOIN s3 ON s1.u = s3.u
           |LEFT JOIN s4 ON s1.u = s4.u""".stripMargin
      }),

    // CASE WHEN with bool branches over random strings (suite:853-902)
    multi("rf12_casewhen", Seq("a", "b", "c", "d", "e", "cw"), {
      (s, off) =>
        val spec = Seq(ColSpec("a", CBool, 0), ColSpec("b", CStr, 0),
          ColSpec("c", CBool, 5), ColSpec("d", CStr, 10), ColSpec("e", CStr, 10))
        RandFrame.df(s, 20, 6001L + off, spec: _*).select(
          col("a"), col("b"), col("c"), col("d"), col("e"),
          Kernels.caseWhen(
            Seq((col("a"): Column) -> col("b"), (col("c"): Column) -> col("d")),
            col("e")).as("cw"))
    },
      { off =>
        val spec = Seq(ColSpec("a", CBool, 0), ColSpec("b", CStr, 0),
          ColSpec("c", CBool, 5), ColSpec("d", CStr, 10), ColSpec("e", CStr, 10))
        s"""SELECT a, b, c, d, e,
           | CASE WHEN a THEN b WHEN c THEN d ELSE e END AS cw
           |FROM ${RandFrame.valuesSql(20, 6001L + off, spec: _*)} _t""".stripMargin
      })
  )
}
