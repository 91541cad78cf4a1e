package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.{Kernels, SqlCast}
import graft.sources.Tables

/** SURVEY §2.2 E1–E12 — the scalar expression kernel surface, exercised on
  * small deterministic VALUES fixtures (mirroring the reference's literal
  * fixtures, slide_test/suite.py) plus table-backed rows. Oracle SQL spells
  * out the reference semantics explicitly where DuckDB's own defaults
  * differ (TRY_CAST for invalid→NULL, TRUNC for truncate-toward-zero,
  * isnan() guards for the NaN-is-NULL rule, ESCAPE '\' for LIKE).
  */
object Expressions {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** two nullable float columns incl. NaN — the comparison/arith corpus
    * (ref fixtures: suite:202-208)
    */
  private def floatPairs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq[(Int, java.lang.Double, java.lang.Double)](
      (1, 1.5, 2.5), (2, 2.5, 2.5), (3, 3.5, 2.5),
      (4, null, 2.5), (5, 1.5, null), (6, null, null),
      (7, 0.0, -1.5), (8, -2.5, 0.0)
    ).toDF("id", "a", "b")
  }
  private val floatPairsSql =
    """SELECT * FROM (VALUES (1, 1.5::DOUBLE, 2.5::DOUBLE), (2, 2.5, 2.5),
      | (3, 3.5, 2.5), (4, NULL, 2.5), (5, 1.5, NULL), (6, NULL, NULL),
      | (7, 0.0, -1.5), (8, -2.5, 0.0)) t(id, a, b)""".stripMargin

  /** full Kleene truth table fixture (ref: suite:323-328) */
  private def boolPairs(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq[(Int, java.lang.Boolean, java.lang.Boolean)](
      (1, true, true), (2, true, false), (3, true, null),
      (4, false, true), (5, false, false), (6, false, null),
      (7, null, true), (8, null, false), (9, null, null)
    ).toDF("id", "a", "b")
  }
  private val boolPairsSql =
    """SELECT * FROM (VALUES (1, true, true), (2, true, false), (3, true, NULL),
      | (4, false, true), (5, false, false), (6, false, NULL),
      | (7, NULL, true), (8, NULL, false), (9, NULL, NULL)) t(id, a, b)""".stripMargin

  def all: Seq[Q] = Seq(

    // E1 — unary +/- with NULL pass-through (ref: slide/utils.py:135-151)
    Q("e1_unary_minus",
      (s, dir) => floatPairs(s).select(
        col("id"), negate(col("a")).as("neg_a"), col("b").as("pos_b"))
        .orderBy("id"),
      Some(s"SELECT id, -a AS neg_a, b AS pos_b FROM ($floatPairsSql) ORDER BY id")),

    // E2 — binary arithmetic with NULL propagation; / is float division
    // (ref: slide/utils.py:153-174; x/0 unspecified → avoided, suite:172-174)
    Q("e2_arith",
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 50 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") + col("l_tax")).as("add"),
          (col("l_extendedprice") - col("l_discount")).as("sub"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("mul"),
          (col("l_extendedprice") / col("l_quantity")).as("div"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             | l_extendedprice + l_tax AS add,
             | l_extendedprice - l_discount AS sub,
             | l_extendedprice * (1 - l_discount) AS mul,
             | l_extendedprice / l_quantity AS div
             |FROM lineitem WHERE l_orderkey % 50 = 0
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // E3 — comparisons: NULL if either side NULL (ref: slide/utils.py:176-206)
    Q("e3_comparison_3vl",
      (s, dir) => floatPairs(s).select(
        col("id"),
        (col("a") < col("b")).as("lt"), (col("a") <= col("b")).as("le"),
        (col("a") === col("b")).as("eq"), (col("a") =!= col("b")).as("ne"),
        (col("a") > col("b")).as("gt"), (col("a") >= col("b")).as("ge"))
        .orderBy("id"),
      Some(s"""SELECT id, a < b AS lt, a <= b AS le, a = b AS eq,
              | a <> b AS ne, a > b AS gt, a >= b AS ge
              |FROM ($floatPairsSql) ORDER BY id""".stripMargin)),

    // E3b — comparisons over strings and timestamps (ref oracle corpus
    // suite:240-295): lexicographic and chronological 3VL
    Q("e3b_comparison_types",
      (s, dir) => {
        import s.implicits._
        val df = Seq(
          (1, "xx", "x", "2020-01-01", "2020-01-02"),
          (2, "x", "x", "2020-01-02", "2020-01-01"),
          (3, null, "x", null, "2020-01-01"),
          (4, "X", "x", "2020-01-01", "2020-01-01"),
          (5, "", "x", null, null)
        ).toDF("id", "s1", "s2", "d1s", "d2s")
          .withColumn("d1", col("d1s").cast(TimestampNTZType))
          .withColumn("d2", col("d2s").cast(TimestampNTZType))
        df.select(col("id"),
          (col("s1") < col("s2")).as("s_lt"),
          (col("s1") === col("s2")).as("s_eq"),
          (col("s1") >= col("s2")).as("s_ge"),
          (col("d1") < col("d2")).as("d_lt"),
          (col("d1") === col("d2")).as("d_eq"),
          (col("d1") >= col("d2")).as("d_ge"))
          .orderBy("id")
      },
      Some("""SELECT id, s1 < s2 AS s_lt, s1 = s2 AS s_eq, s1 >= s2 AS s_ge,
             | d1 < d2 AS d_lt, d1 = d2 AS d_eq, d1 >= d2 AS d_ge
             |FROM (SELECT id, s1, s2, CAST(d1s AS TIMESTAMP) AS d1,
             |  CAST(d2s AS TIMESTAMP) AS d2 FROM (VALUES
             |  (1, 'xx', 'x', '2020-01-01', '2020-01-02'),
             |  (2, 'x', 'x', '2020-01-02', '2020-01-01'),
             |  (3, NULL, 'x', NULL, '2020-01-01'),
             |  (4, 'X', 'x', '2020-01-01', '2020-01-01'),
             |  (5, '', 'x', NULL, NULL)) t(id, s1, s2, d1s, d2s))
             |ORDER BY id""".stripMargin)),

    // E4 — Kleene AND/OR over the full truth table (ref: slide/utils.py:208-231)
    Q("e4_logic_kleene",
      (s, dir) => boolPairs(s).select(
        col("id"), (col("a") && col("b")).as("and_ab"), (col("a") || col("b")).as("or_ab"))
        .orderBy("id"),
      Some(s"SELECT id, a AND b AS and_ab, a OR b AS or_ab FROM ($boolPairsSql) ORDER BY id")),

    // E5 — SQL NOT, NULL-preserving (ref: slide/utils.py:233-243)
    Q("e5_not",
      (s, dir) => boolPairs(s).select(col("id"), (!col("a")).as("not_a"))
        .orderBy("id"),
      Some(s"SELECT id, NOT a AS not_a FROM ($boolPairsSql) ORDER BY id")),

    // E6 — IS NULL / IS TRUE / IS FALSE with numeric truthiness and the
    // NaN-is-NULL rule (ref: slide/utils.py:337-367; suite:391-462)
    Q("e6_is_value",
      (s, dir) => {
        import s.implicits._
        val df = Seq[(Int, java.lang.Double)](
          (1, 2.5), (2, 0.0), (3, -1.0), (4, null), (5, Double.NaN)
        ).toDF("id", "x")
        df.select(
          col("id"),
          Kernels.isValue(col("x"), DoubleType, None, positive = true).as("is_null"),
          Kernels.isValue(col("x"), DoubleType, None, positive = false).as("is_not_null"),
          Kernels.isValue(col("x"), DoubleType, Some(true), positive = true).as("is_true"),
          Kernels.isValue(col("x"), DoubleType, Some(true), positive = false).as("is_not_true"),
          Kernels.isValue(col("x"), DoubleType, Some(false), positive = true).as("is_false"),
          Kernels.isValue(col("x"), DoubleType, Some(false), positive = false).as("is_not_false"))
          .orderBy("id")
      },
      Some("""SELECT id,
             | (x IS NULL OR isnan(x)) AS is_null,
             | NOT (x IS NULL OR isnan(x)) AS is_not_null,
             | (x IS NOT NULL AND NOT isnan(x) AND x <> 0) AS is_true,
             | NOT (x IS NOT NULL AND NOT isnan(x) AND x <> 0) AS is_not_true,
             | (x IS NOT NULL AND NOT isnan(x) AND x = 0) AS is_false,
             | NOT (x IS NOT NULL AND NOT isnan(x) AND x = 0) AS is_not_false
             |FROM (VALUES (1, 2.5::DOUBLE), (2, 0.0), (3, -1.0), (4, NULL),
             | (5, 'nan'::DOUBLE)) t(id, x) ORDER BY id""".stripMargin)),

    // E7 — SQL IN/NOT IN incl. NULL elements and column elements, full 3VL
    // (ref: slide/utils.py:369-414; oracle suite:464-601)
    Q("e7_in_3vl",
      (s, dir) => floatPairs(s).select(
        col("id"),
        Kernels.isIn(col("a"), Seq(1.5, 3.5), positive = true).as("in_consts"),
        Kernels.isIn(col("a"), Seq(1.5, null), positive = true).as("in_with_null"),
        Kernels.isIn(col("a"), Seq(lit(9.9), col("b")), positive = true).as("in_cols"),
        Kernels.isIn(col("a"), Seq(1.5, null), positive = false).as("not_in_with_null"))
        .orderBy("id"),
      Some(s"""SELECT id, a IN (1.5, 3.5) AS in_consts,
              | a IN (1.5, NULL) AS in_with_null,
              | a IN (9.9, b) AS in_cols,
              | a NOT IN (1.5, NULL) AS not_in_with_null
              |FROM ($floatPairsSql) ORDER BY id""".stripMargin)),

    // E7b — IN lists over strings, booleans, and timestamps
    // (suite covers all reference types)
    Q("e7b_in_types",
      (s, dir) => {
        import s.implicits._
        val df = Seq(
          (1, "x", java.lang.Boolean.TRUE, "2020-01-01"),
          (2, "y", java.lang.Boolean.FALSE, "2020-01-03"),
          (3, null, null, null),
          (4, "z", java.lang.Boolean.TRUE, "2020-01-05")
        ).toDF("id", "s", "b", "ds")
          .withColumn("d", col("ds").cast(TimestampNTZType))
        df.select(col("id"),
          Kernels.isIn(col("s"), Seq("x", "z"), positive = true).as("s_in"),
          Kernels.isIn(col("s"), Seq("x", null), positive = false).as("s_not_in_null"),
          Kernels.isIn(col("b"), Seq(true), positive = true).as("b_in"),
          Kernels.isIn(col("d"),
            Seq(lit("2020-01-01").cast(TimestampNTZType),
              lit("2020-01-05").cast(TimestampNTZType)), positive = true).as("d_in"))
          .orderBy("id")
      },
      Some("""SELECT id, s IN ('x', 'z') AS s_in,
             | s NOT IN ('x', NULL) AS s_not_in_null,
             | b IN (true) AS b_in,
             | d IN (TIMESTAMP '2020-01-01', TIMESTAMP '2020-01-05') AS d_in
             |FROM (SELECT id, s, b, CAST(ds AS TIMESTAMP) AS d FROM (VALUES
             |  (1, 'x', true, '2020-01-01'), (2, 'y', false, '2020-01-03'),
             |  (3, NULL, NULL, NULL), (4, 'z', true, '2020-01-05'))
             |  t(id, s, b, ds))
             |ORDER BY id""".stripMargin)),

    // E22 — aggregates over empty input: COUNT→0, SUM/MIN/MAX/AVG→NULL
    Q("e22_empty_aggs",
      (s, dir) => t(s, dir, "lineitem")
        .filter(lit(false))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast(LongType)).as("s"),
          max(col("l_quantity").cast(LongType)).as("mx"),
          min(col("l_quantity").cast(LongType)).as("mn"),
          avg(col("l_quantity")).as("av")),
      Some("""SELECT COUNT(*) AS cnt,
             | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
             | MAX(CAST(l_quantity AS BIGINT)) AS mx,
             | MIN(CAST(l_quantity AS BIGINT)) AS mn,
             | AVG(l_quantity) AS av
             |FROM lineitem WHERE FALSE""".stripMargin)),

    // E8 — BETWEEN/NOT BETWEEN 3VL incl. one-sided determinism
    // (ref: slide/utils.py:416-468; suite:603-691)
    Q("e8_between_3vl",
      (s, dir) => {
        import s.implicits._
        val df = Seq[(Int, java.lang.Double, java.lang.Double, java.lang.Double)](
          (1, 2.0, 1.0, 3.0), (2, 0.5, 1.0, 3.0), (3, 4.0, 1.0, 3.0),
          (4, 2.0, null, 3.0), (5, 4.0, null, 3.0), // one-sided: x>hi ⇒ false
          (6, 2.0, 1.0, null), (7, 0.5, 1.0, null), // one-sided: x<lo ⇒ false
          (8, null, 1.0, 3.0), (9, null, null, null)
        ).toDF("id", "x", "lo", "hi")
        df.select(col("id"),
          Kernels.isBetween(col("x"), col("lo"), col("hi"), positive = true).as("btw"),
          Kernels.isBetween(col("x"), col("lo"), col("hi"), positive = false).as("not_btw"))
          .orderBy("id")
      },
      Some("""SELECT id, x >= lo AND x <= hi AS btw,
             | NOT (x >= lo AND x <= hi) AS not_btw
             |FROM (VALUES (1, 2.0::DOUBLE, 1.0::DOUBLE, 3.0::DOUBLE),
             | (2, 0.5, 1.0, 3.0), (3, 4.0, 1.0, 3.0), (4, 2.0, NULL, 3.0),
             | (5, 4.0, NULL, 3.0), (6, 2.0, 1.0, NULL), (7, 0.5, 1.0, NULL),
             | (8, NULL, 1.0, 3.0), (9, NULL, NULL, NULL)) t(id, x, lo, hi)
             |ORDER BY id""".stripMargin)),

    // E17 — null-safe equality (<=> / IS NOT DISTINCT FROM)
    Q("e17_null_safe_eq",
      (s, dir) => floatPairs(s).select(
        col("id"),
        (col("a") <=> col("b")).as("nseq"),
        (!(col("a") <=> col("b"))).as("distinct_ab"))
        .orderBy("id"),
      Some(s"""SELECT id, a IS NOT DISTINCT FROM b AS nseq,
              | a IS DISTINCT FROM b AS distinct_ab
              |FROM ($floatPairsSql) ORDER BY id""".stripMargin)),

    // E9 — COALESCE over series + constants (ref: slide/utils.py:470-486)
    Q("e9_coalesce",
      (s, dir) => floatPairs(s).select(
        col("id"),
        coalesce(col("a"), col("b"), lit(-1.0)).as("coal"),
        coalesce(col("a"), col("b")).as("coal2"))
        .orderBy("id"),
      Some(s"""SELECT id, COALESCE(a, b, -1.0::DOUBLE) AS coal, COALESCE(a, b) AS coal2
              |FROM ($floatPairsSql) ORDER BY id""".stripMargin)),

    // E9b — COALESCE across the reference's other types (suite:693-843:
    // bool/int/str/datetime variants)
    Q("e9b_coalesce_types",
      (s, dir) => {
        import s.implicits._
        val df = Seq[(Int, java.lang.Boolean, java.lang.Long, String, String)](
          (1, null, null, null, null),
          (2, true, 5L, "x", "2020-01-01"),
          (3, null, 7L, null, "2020-02-02"),
          (4, false, null, "y", null)
        ).toDF("id", "b", "i", "t", "d0")
          .withColumn("d", col("d0").cast(TimestampNTZType)).drop("d0")
        df.select(col("id"),
          coalesce(col("b"), lit(false)).as("cb"),
          coalesce(col("i"), lit(-1L)).as("ci"),
          coalesce(col("t"), lit("zz")).as("ct"),
          coalesce(col("d"), lit("1970-01-01").cast(TimestampNTZType)).as("cd"))
          .orderBy("id")
      },
      Some("""SELECT id, COALESCE(b, false) AS cb, COALESCE(i, -1) AS ci,
             | COALESCE(t, 'zz') AS ct,
             | COALESCE(d, TIMESTAMP '1970-01-01') AS cd
             |FROM (SELECT id, b, i, t, CAST(d0 AS TIMESTAMP) AS d FROM (VALUES
             |  (1, NULL, NULL, NULL, NULL),
             |  (2, true, CAST(5 AS BIGINT), 'x', '2020-01-01'),
             |  (3, NULL, 7, NULL, '2020-02-02'),
             |  (4, false, NULL, 'y', NULL)) t0(id, b, i, t, d0))
             |ORDER BY id""".stripMargin)),

    // E10b — CASE WHEN with boolean conditions over the bool/str corpus
    // (suite:853-902)
    Q("e10b_case_when_bool",
      (s, dir) => {
        import s.implicits._
        val df = Seq[(Int, java.lang.Boolean, String, java.lang.Boolean, String, String)](
          (1, true, "a", false, "b", "c"), (2, false, "a", true, "b", "c"),
          (3, null, "a", null, "b", "c"), (4, false, "a", false, "b", null),
          (5, true, null, true, "b", "c")
        ).toDF("id", "c1", "v1", "c2", "v2", "dflt")
        df.select(col("id"),
          Kernels.caseWhen(Seq(
            Kernels.truthy(col("c1"), BooleanType) -> col("v1"),
            Kernels.truthy(col("c2"), BooleanType) -> col("v2")),
            col("dflt")).as("cw"))
          .orderBy("id")
      },
      Some("""SELECT id, CASE WHEN c1 THEN v1 WHEN c2 THEN v2 ELSE dflt END AS cw
             |FROM (VALUES (1, true, 'a', false, 'b', 'c'),
             | (2, false, 'a', true, 'b', 'c'), (3, NULL, 'a', NULL, 'b', 'c'),
             | (4, false, 'a', false, 'b', NULL), (5, true, NULL, true, 'b', 'c'))
             | t(id, c1, v1, c2, v2, dflt) ORDER BY id""".stripMargin)),

    // E10 — CASE WHEN with numeric-truthiness conditions, first-match-wins
    // (ref: slide/utils.py:488-529; oracle suite:845-965)
    Q("e10_case_when",
      (s, dir) => {
        import s.implicits._
        val df = Seq[(Int, java.lang.Double, java.lang.Double)](
          (1, 1.0, 5.0), (2, 0.0, 5.0), (3, null, 5.0),
          (4, 2.0, 0.0), (5, 0.0, 0.0), (6, null, null)
        ).toDF("id", "c1", "c2")
        df.select(col("id"),
          Kernels.caseWhen(Seq(
            Kernels.truthy(col("c1"), DoubleType) -> lit("first"),
            Kernels.truthy(col("c2"), DoubleType) -> lit("second")),
            lit("default")).as("cw"))
          .orderBy("id")
      },
      Some("""SELECT id, CASE
             | WHEN c1 IS NOT NULL AND NOT isnan(c1) AND c1 <> 0 THEN 'first'
             | WHEN c2 IS NOT NULL AND NOT isnan(c2) AND c2 <> 0 THEN 'second'
             | ELSE 'default' END AS cw
             |FROM (VALUES (1, 1.0::DOUBLE, 5.0::DOUBLE), (2, 0.0, 5.0),
             | (3, NULL, 5.0), (4, 2.0, 0.0), (5, 0.0, 0.0), (6, NULL, NULL))
             | t(id, c1, c2) ORDER BY id""".stripMargin)),

    // E11 — LIKE corpus with %/_ and escape \ (ref: slide/utils.py:531-600,
    // slide/_string_utils.py; corpus suite:1016-1117). DuckDB needs the
    // ESCAPE '\' clause spelled out; Spark defaults to it.
    Q("e11_like",
      (s, dir) => {
        import s.implicits._
        val df = Seq((1, "abc"), (2, "ABC"), (3, "abd"), (4, "aBd"),
          (5, ""), (6, "ab%_c"), (7, null.asInstanceOf[String]), (8, "xabcx"))
          .toDF("id", "v")
        df.select(col("id"),
          Kernels.like(col("v"), "a%", ignoreCase = false, positive = true).as("starts_a"),
          Kernels.like(col("v"), "%c", ignoreCase = false, positive = true).as("ends_c"),
          Kernels.like(col("v"), "%b%", ignoreCase = false, positive = true).as("has_b"),
          Kernels.like(col("v"), "a_c", ignoreCase = false, positive = true).as("a_c"),
          Kernels.like(col("v"), "ab\\%\\_c", ignoreCase = false, positive = true).as("escaped"),
          Kernels.like(col("v"), "", ignoreCase = false, positive = true).as("empty"),
          Kernels.like(col("v"), "abc", ignoreCase = true, positive = true).as("iabc"),
          Kernels.like(col("v"), "a%", ignoreCase = false, positive = false).as("not_starts_a"))
          .orderBy("id")
      },
      Some("""SELECT id, v LIKE 'a%' AS starts_a, v LIKE '%c' AS ends_c,
             | v LIKE '%b%' AS has_b, v LIKE 'a_c' AS a_c,
             | v LIKE 'ab\%\_c' ESCAPE '\' AS escaped,
             | v LIKE '' AS empty, v ILIKE 'abc' AS iabc,
             | v NOT LIKE 'a%' AS not_starts_a
             |FROM (VALUES (1, 'abc'), (2, 'ABC'), (3, 'abd'), (4, 'aBd'),
             | (5, ''), (6, 'ab%_c'), (7, NULL), (8, 'xabcx')) t(id, v)
             |ORDER BY id""".stripMargin)),

    // E11b — the reference's full LIKE corpus (suite:1016-1117): 17
    // pattern/case combinations plus the NULL pattern, positive and
    // negated, over the exact reference fixture. Spark expressions and
    // oracle SQL are generated from one pattern table.
    Q("e11b_like_corpus", {
      val pats: Seq[(String, String, Boolean)] = Seq(
        ("i", "", false), ("j", "abc", true), ("k", "aBc", false),
        ("l", "ab%", true), ("m", "aB%", false), ("n", "%bc", true),
        ("o", "%bc", false), ("p", "a%c", true), ("q", "a%c", false),
        ("r", "%bc%", true), ("s", "%bc%", false), ("t", "%_", false),
        ("u", "_%", false), ("v", "%_%", false), ("w", "_a%", true),
        ("x", "_a%", false), ("y", "%", false))
      (s: SparkSession, dir: String) => {
        import s.implicits._
        val df = Seq((1, "abc"), (2, "ABC"), (3, "abd"), (4, "aBd"),
          (5, ""), (6, "ab\\%\\_c"), (7, null.asInstanceOf[String]))
          .toDF("id", "a")
        val nullPat = lit(null).cast(BooleanType)
        val cols = Seq(col("id"), nullPat.as("h"), nullPat.as("nh")) ++
          pats.flatMap { case (n, p, ic) => Seq(
            Kernels.like(col("a"), p, ignoreCase = ic, positive = true).as(n),
            Kernels.like(col("a"), p, ignoreCase = ic, positive = false).as(s"n$n"))
          }
        df.select(cols: _*).orderBy("id")
      }
    },
      Some {
        val pats: Seq[(String, String, Boolean)] = Seq(
          ("i", "", false), ("j", "abc", true), ("k", "aBc", false),
          ("l", "ab%", true), ("m", "aB%", false), ("n", "%bc", true),
          ("o", "%bc", false), ("p", "a%c", true), ("q", "a%c", false),
          ("r", "%bc%", true), ("s", "%bc%", false), ("t", "%_", false),
          ("u", "_%", false), ("v", "%_%", false), ("w", "_a%", true),
          ("x", "_a%", false), ("y", "%", false))
        val exprs = Seq("a LIKE NULL AS h", "a NOT LIKE NULL AS nh") ++
          pats.flatMap { case (n, p, ic) =>
            val op = if (ic) "ILIKE" else "LIKE"
            Seq(s"a $op '$p' AS $n", s"a NOT $op '$p' AS n$n")
          }
        s"""SELECT id, ${exprs.mkString(", ")}
           |FROM (VALUES (1, 'abc'), (2, 'ABC'), (3, 'abd'), (4, 'aBd'),
           | (5, ''), (6, 'ab\\%\\_c'), (7, NULL)) t(id, a)
           |ORDER BY id""".stripMargin
      }),

    // E12a — string → numeric casts: via-double int truncation ('1.1'→1),
    // 'naN'→NULL, invalid→NULL (ref matrix §2.3; suite:1437-1455,1541-1559)
    Q("e12_cast_str_num",
      (s, dir) => {
        import s.implicits._
        val df = Seq((1, "1.1"), (2, "naN"), (3, "-2.7"), (4, "100"),
          (5, null.asInstanceOf[String]), (6, "x"), (7, "2e2"), (8, "-0.4"))
          .toDF("id", "v")
        df.select(col("id"),
          SqlCast.to(col("v"), StringType, LongType).as("as_long"),
          SqlCast.to(col("v"), StringType, IntegerType).as("as_int"),
          SqlCast.to(col("v"), StringType, DoubleType).as("as_double"))
          .orderBy("id")
      },
      Some("""SELECT id,
             | CAST(TRUNC(CASE WHEN lower(v) = 'nan' THEN NULL
             |   ELSE TRY_CAST(v AS DOUBLE) END) AS BIGINT) AS as_long,
             | CAST(TRUNC(CASE WHEN lower(v) = 'nan' THEN NULL
             |   ELSE TRY_CAST(v AS DOUBLE) END) AS INTEGER) AS as_int,
             | CASE WHEN lower(v) = 'nan' THEN NULL
             |   ELSE TRY_CAST(v AS DOUBLE) END AS as_double
             |FROM (VALUES (1, '1.1'), (2, 'naN'), (3, '-2.7'), (4, '100'),
             | (5, NULL), (6, 'x'), (7, '2e2'), (8, '-0.4')) t(id, v)
             |ORDER BY id""".stripMargin)),

    // E12b — string → bool strict accept-list (ref: slide/utils.py:1011-1015;
    // suite:1324-1351): 'true'/'1'/'1.0' ↔ 'false'/'0'/'0.0', else NULL
    Q("e12_cast_str_bool",
      (s, dir) => {
        import s.implicits._
        val df = Seq((1, "true"), (2, "False"), (3, "1"), (4, "0"),
          (5, "1.0"), (6, "0.0"), (7, "yes"), (8, "x"),
          (9, null.asInstanceOf[String]), (10, "TRUE"))
          .toDF("id", "v")
        df.select(col("id"),
          SqlCast.to(col("v"), StringType, BooleanType).as("as_bool"))
          .orderBy("id")
      },
      Some("""SELECT id, CASE WHEN lower(v) IN ('true','1','1.0') THEN true
             | WHEN lower(v) IN ('false','0','0.0') THEN false
             | ELSE NULL END AS as_bool
             |FROM (VALUES (1, 'true'), (2, 'False'), (3, '1'), (4, '0'),
             | (5, '1.0'), (6, '0.0'), (7, 'yes'), (8, 'x'), (9, NULL),
             | (10, 'TRUE')) t(id, v) ORDER BY id""".stripMargin)),

    // E12c — float → bool/int/string: NaN→NULL everywhere, truncation
    // toward zero, inf→'inf' string form (ref matrix §2.3)
    Q("e12_cast_float",
      (s, dir) => {
        import s.implicits._
        val df = Seq[(Int, java.lang.Double)](
          (1, 2.1), (2, -2.7), (3, 0.0), (4, null), (5, Double.NaN),
          (6, 10.0), (7, Double.PositiveInfinity), (8, Double.NegativeInfinity)
        ).toDF("id", "v")
        df.select(col("id"),
          SqlCast.to(col("v"), DoubleType, BooleanType).as("as_bool"),
          SqlCast.to(col("v"), DoubleType, StringType).as("as_str"),
          // integral target excludes the inf rows (they raise — E12d)
          when(col("id") < 7, SqlCast.to(col("v"), DoubleType, LongType)).as("as_long"))
          .orderBy("id")
      },
      Some("""SELECT id,
             | CASE WHEN isnan(v) THEN NULL ELSE v <> 0 END AS as_bool,
             | CASE WHEN isnan(v) THEN NULL
             |   WHEN v = 'inf'::DOUBLE THEN 'inf'
             |   WHEN v = '-inf'::DOUBLE THEN '-inf'
             |   ELSE CAST(v AS VARCHAR) END AS as_str,
             | CASE WHEN id < 7 THEN
             |   CAST(TRUNC(CASE WHEN isnan(v) THEN NULL ELSE v END) AS BIGINT)
             | END AS as_long
             |FROM (VALUES (1, 2.1::DOUBLE), (2, -2.7), (3, 0.0), (4, NULL),
             | (5, 'nan'::DOUBLE), (6, 10.0), (7, 'inf'::DOUBLE),
             | (8, '-inf'::DOUBLE)) t(id, v) ORDER BY id""".stripMargin)),

    // E12e — bool → int/string; int → bool/string (ref matrix §2.3)
    Q("e12_cast_bool_int",
      (s, dir) => {
        import s.implicits._
        val df = Seq[(Int, java.lang.Boolean, java.lang.Integer)](
          (1, true, 5), (2, false, 0), (3, null, -3), (4, true, null)
        ).toDF("id", "b", "i")
        df.select(col("id"),
          SqlCast.to(col("b"), BooleanType, LongType).as("b_long"),
          SqlCast.to(col("b"), BooleanType, StringType).as("b_str"),
          SqlCast.to(col("i"), IntegerType, BooleanType).as("i_bool"),
          SqlCast.to(col("i"), IntegerType, StringType).as("i_str"),
          SqlCast.to(col("i"), IntegerType, DoubleType).as("i_double"))
          .orderBy("id")
      },
      Some("""SELECT id, CAST(b AS BIGINT) AS b_long, CAST(b AS VARCHAR) AS b_str,
             | i <> 0 AS i_bool, CAST(i AS VARCHAR) AS i_str,
             | CAST(i AS DOUBLE) AS i_double
             |FROM (VALUES (1, true, 5), (2, false, 0), (3, NULL, -3),
             | (4, true, NULL)) t(id, b, i) ORDER BY id""".stripMargin)),

    // E12f — string ↔ timestamp/date: parse, invalid→NULL, ts→date
    // truncation, canonical string forms (ref: slide/utils.py:1103-1122;
    // suite:1708-1794)
    Q("e12_cast_datetime",
      (s, dir) => {
        import s.implicits._
        val df = Seq((1, "2020-01-01"), (2, "2020-01-01 15:16:17"),
          (3, "bad"), (4, null.asInstanceOf[String]), (5, "2020-02-29 00:00:00"))
          .toDF("id", "v")
        val ts = SqlCast.to(col("v"), StringType, TimestampNTZType)
        df.select(col("id"),
          ts.as("as_ts"),
          SqlCast.to(col("v"), StringType, DateType).as("as_date"),
          SqlCast.to(ts, TimestampNTZType, DateType).as("ts_date"),
          SqlCast.to(ts, TimestampNTZType, StringType).as("ts_str"))
          .orderBy("id")
      },
      Some("""SELECT id, TRY_CAST(v AS TIMESTAMP) AS as_ts,
             | TRY_CAST(v AS DATE) AS as_date,
             | CAST(TRY_CAST(v AS TIMESTAMP) AS DATE) AS ts_date,
             | CAST(TRY_CAST(v AS TIMESTAMP) AS VARCHAR) AS ts_str
             |FROM (VALUES (1, '2020-01-01'), (2, '2020-01-01 15:16:17'),
             | (3, 'bad'), (4, NULL), (5, '2020-02-29 00:00:00')) t(id, v)
             |ORDER BY id""".stripMargin))
  )
}
