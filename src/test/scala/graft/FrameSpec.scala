package graft

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{Frame, JoinType}

/** Relational-operator conformance from the reference's literal fixtures
  * (slide_test/suite.py:2205-2466, 2020-2153).
  */
class FrameSpec extends SparkSpec {

  private def df(rows: Seq[Seq[Any]], schema: String): Frame = {
    val st = graft.schema.SchemaDSL.parse(schema)
    Frame(spark.createDataFrame(
      java.util.List.copyOf(
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.map(r => Row(r: _*))).asJava),
      st))
  }

  private def rows(f: Frame): Set[Seq[Any]] =
    f.df.collect().map(_.toSeq).toSet

  test("join type parser (tests/slide/test_utils.py:1-25)") {
    assert(JoinType.parse("inner") === "inner")
    assert(JoinType.parse("Inner Join") === "inner")
    assert(JoinType.parse("left semi") === "left_semi")
    assert(JoinType.parse("left_anti") === "left_anti")
    assert(JoinType.parse("LEFT OUTER") === "left_outer")
    assert(JoinType.parse("full  outer") === "full_outer")
    assert(JoinType.parse("cross") === "cross")
    intercept[GraftInvalidOperation](JoinType.parse("bogus"))
  }

  test("joins incl. NULL keys never match (suite:2393-2452)") {
    val df1 = df(Seq(Seq(0L, 1L), Seq(2L, 3L)), "a:long,b:long")
    val df2 = df(Seq(Seq(0L, 10L), Seq(20L, 30L)), "a:long,c:long")
    val df3 = df(Seq(Seq(0L, 1L), Seq(null, 3L)), "a:long,b:long")
    val df4 = df(Seq(Seq(0L, 10L), Seq(null, 30L)), "a:long,c:long")

    assert(rows(df1.join(df2, "inner", Seq("a"))) === Set(Seq(0L, 1L, 10L)))
    assert(rows(df3.join(df4, "inner", Seq("a"))) === Set(Seq(0L, 1L, 10L)))
    assert(rows(df1.join(df2, "left_semi", Seq("a"))) === Set(Seq(0L, 1L)))
    assert(rows(df3.join(df4, "left_semi", Seq("a"))) === Set(Seq(0L, 1L)))
    assert(rows(df1.join(df2, "left_anti", Seq("a"))) === Set(Seq(2L, 3L)))
    assert(rows(df3.join(df4, "left_anti", Seq("a"))) === Set(Seq(null, 3L)))
    assert(rows(df3.join(df4, "left_outer", Seq("a"))) ===
      Set(Seq(0L, 1L, 10L), Seq(null, 3L, null)))
    assert(rows(df3.join(df4, "right_outer", Seq("a"))) ===
      Set(Seq(0L, 1L, 10L), Seq(null, null, 30L)))
    assert(rows(df3.join(df4, "full_outer", Seq("a"))) ===
      Set(Seq(0L, 1L, 10L), Seq(null, 3L, null), Seq(null, null, 30L)))
  }

  test("cross join (suite:2453-2466)") {
    val df1 = df(Seq(Seq(0L, 1L), Seq(null, 3L)), "a:long,b:long")
    val df2 = df(Seq(Seq(0L, 10L), Seq(null, 30L)), "c:long,d:long")
    assert(rows(df1.join(df2, "cross")) === Set(
      Seq(0L, 1L, 0L, 10L), Seq(null, 3L, 0L, 10L),
      Seq(0L, 1L, null, 30L), Seq(null, 3L, null, 30L)))
  }

  test("union aligns columns positionally (suite:2205-2227)") {
    val a = df(Seq(Seq("x", "a"), Seq("x", "a"), Seq(null, null)), "a:str,b:str")
    // second frame has *swapped column names*; alignment must be positional
    val b = df(Seq(Seq("xx", "aa"), Seq(null, null), Seq("a", "x")), "b:str,a:str")
    val all = a.union(b, unique = false)
    assert(all.df.columns.toSeq === Seq("a", "b"))
    assert(all.df.count() === 6)
    assert(rows(all).contains(Seq("xx", "aa"))) // NOT (aa, xx)
    val uniq = a.union(b, unique = true)
    // ("x","a") dups collapse and the (null,null) rows collapse across frames
    assert(uniq.df.count() === 4)
  }

  test("intersect/except incl. unique=false duplicate retention (suite:2275-2341)") {
    val a = df(Seq(Seq("x", "a"), Seq("x", "a"), Seq(null, null)), "a:str,b:str")
    val b = df(Seq(Seq("x", "a"), Seq(null, null), Seq(null, null)), "a:str,b:str")
    assert(rows(a.intersect(b, unique = true)) ===
      Set(Seq("x", "a"), Seq(null, null)))
    // unique=false keeps df1's duplicates; NULL rows match each other
    assert(a.intersect(b, unique = false).df.count() === 3)
    assert(rows(a.except(b, unique = true)) === Set.empty)
    val c = df(Seq(Seq("y", "b"), Seq(null, null)), "a:str,b:str")
    assert(rows(a.except(c, unique = true)) === Set(Seq("x", "a")))
    assert(a.except(c, unique = false).df.count() === 2) // both ("x","a") copies kept
  }

  test("distinct equates NULLs (suite:2160-2194)") {
    val a = df(Seq(Seq(null, null), Seq(null, null), Seq(1L, null)), "a:long,b:long")
    assert(a.dropDuplicates().df.count() === 2)
  }

  test("groupApply keeps NULL keys (suite:2020-2153)") {
    val a = df(Seq(Seq("a", 1L), Seq("a", 2L), Seq(null, 3L)), "b:str,c:long")
    val out = StructType(Seq(
      StructField("b", StringType), StructField("cnt", LongType),
      StructField("s", LongType)))
    val res = a.groupApply(Seq("b"), out) { it =>
      var b: String = null
      var n = 0L
      var s = 0L
      it.foreach { r => b = r.getString(0); n += 1; s += r.getLong(1) }
      Iterator(Row(b, n, s))
    }
    assert(rows(res) === Set(Seq("a", 2L, 3L), Seq(null, 1L, 3L)))
  }

  test("groupApply with empty cols maps partitions (slide_dask/utils.py:97-98)") {
    val a = df(Seq(Seq(1L), Seq(2L), Seq(3L)), "c:long")
    val out = StructType(Seq(StructField("s", LongType)))
    val res = a.groupApply(Nil, out) { it =>
      Iterator(Row(it.map(_.getLong(0)).sum))
    }
    // one row per non-empty partition; totals must sum to 6
    assert(res.df.collect().map(_.getLong(0)).sum === 6L)
  }

  test("groupApply with datetime keys incl. NULL (suite:2088-2153)") {
    val a = df(Seq(
      Seq[Any](java.time.LocalDateTime.of(2020, 1, 1, 0, 0), 1L),
      Seq[Any](java.time.LocalDateTime.of(2020, 1, 1, 0, 0), 2L),
      Seq[Any](null, 3L)), "d:datetime,c:long")
    val out = StructType(Seq(
      StructField("d", TimestampNTZType), StructField("cnt", LongType)))
    val res = a.groupApply(Seq("d"), out) { it =>
      var d: Any = null
      var n = 0L
      it.foreach { r => d = r.get(0); n += 1 }
      Iterator(Row(d, n))
    }
    val got = res.df.collect().map(r => (Option(r.get(0)).map(_.toString), r.getLong(1))).toSet
    assert(got === Set((Some("2020-01-01T00:00"), 2L), (None, 1L)))
  }

  test("scalar-or-column duality: constant kernels fold to constants") {
    import graft.functions.{Kernels, SqlCast}
    // cast(None, anything) ⇒ None (slide/utils.py:299-314)
    val row = spark.range(1).select(
      SqlCast.to(lit(null).cast(StringType), StringType, LongType).as("c1"),
      SqlCast.to(lit("1.1"), StringType, LongType).as("c2"),
      coalesce(lit(null).cast(LongType), lit(7L)).as("c3"),
      Kernels.truthy(lit(2.5), DoubleType).as("c4"),
      Kernels.caseWhen(Seq((lit(false): Column) -> lit("a")), lit("d")).as("c5")).head()
    assert(row.get(0) === null)
    assert(row.getLong(1) === 1L)
    assert(row.getLong(2) === 7L)
    assert(row.getBoolean(3) === true)
    assert(row.getString(4) === "d")
  }

  test("rename/drop/orderBy/limit/rowIterator surface") {
    val a = df(Seq(Seq[Any](2L, "x"), Seq[Any](1L, "y")), "k:long,v:str")
    val r = a.rename("k" -> "key").drop("v")
    assert(r.df.columns.toSeq === Seq("key"))
    intercept[GraftInvalidOperation](a.rename("missing" -> "z"))
    val top = a.orderBy(col("k").desc).limit(1)
    assert(top.df.collect().map(_.getLong(0)).toSeq === Seq(2L))
    assert(a.rowIterator.map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("rename allows swaps and chains, rejects real collisions") {
    val a = df(Seq(Seq[Any](1L, "x")), "k:long,v:str")
    // swap: both renames happen in one pass
    assert(a.rename("k" -> "v", "v" -> "k").df.columns.toSeq === Seq("v", "k"))
    // chain: a->b while b->c frees the name
    val b = df(Seq(Seq[Any](1L, "x")), "a:long,b:str")
    assert(b.rename("a" -> "b", "b" -> "c").df.columns.toSeq === Seq("b", "c"))
    // real collision: target hits an untouched column
    intercept[GraftInvalidOperation](a.rename("k" -> "v"))
    // two mappings landing on the same target
    val c = df(Seq(Seq[Any](1L, "x")), "k:long,v:str")
    intercept[GraftInvalidOperation](c.rename("k" -> "z", "v" -> "z"))
  }

  test("filter truthiness: NULL/0/NaN drop the row (suite:355-389)") {
    // Seq[Any] to stop Scala widening 1L to Double in the mixed literals
    val a = df(Seq(Seq[Any](1L, 1.0), Seq[Any](2L, 0.0), Seq[Any](3L, null),
      Seq[Any](4L, Double.NaN)), "id:long,x:double")
    assert(rows(a.filter(col("x"))).map(_.head) === Set(1L))
    assert(a.filter(false).df.count() === 0)
    assert(a.filter(true).df.count() === 4)
  }

  test("conform applies the cast matrix per field (slide/utils.py:739-763)") {
    val a = df(Seq(Seq("1.1", "true"), Seq("naN", "0")), "x:str,b:str")
    val conformed = a.conform(graft.schema.SchemaDSL.parse("x:long,b:bool"))
    assert(conformed.df.schema.map(_.dataType) === Seq(LongType, BooleanType))
    assert(rows(conformed) === Set(Seq(1L, true), Seq(null, false)))
  }
}
