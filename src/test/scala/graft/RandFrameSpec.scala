package graft

import org.apache.spark.sql.functions._
import graft.testgen.RandFrame
import graft.testgen.RandFrame._

/** Generator contract: exact domains, exact NULL counts, determinism,
  * and Spark/SQL rendering agreement (the property the rf* oracle
  * queries stand on).
  */
class RandFrameSpec extends SparkSpec {

  private val spec = Seq(ColSpec("i", CInt, 7), ColSpec("b", CBool, 3),
    ColSpec("f", CFloat, 11), ColSpec("s", CStr, 5), ColSpec("t", CDateTime, 9))

  test("domains and exact null counts") {
    val df = RandFrame.df(spark, 50, 99L, spec: _*).cache()
    try {
      assert(df.count() === 50)
      val nulls = df.select(spec.map(c =>
        sum(when(col(c.name).isNull, 1L).otherwise(0L)).as(c.name)): _*).head()
      assert(spec.indices.map(nulls.getLong) === Seq(7L, 3L, 11L, 5L, 9L))
      assert(df.filter(col("i").isNotNull && (col("i") < 0 || col("i") >= 10)).count() === 0)
      assert(df.filter(col("f").isNotNull && (col("f") < 0.0 || col("f") >= 1.0)).count() === 0)
      assert(df.filter(col("s").isNotNull && !col("s").rlike("^ssssss[0-9]$")).count() === 0)
      assert(df.filter(col("t").isNotNull &&
        (col("t") < lit("2020-01-01") || col("t") > lit("2020-01-10"))).count() === 0)
    } finally df.unpersist()
  }

  test("same seed regenerates identical data; different seed differs") {
    val a = RandFrame.df(spark, 40, 7L, spec: _*).collect().toSeq
    val b = RandFrame.df(spark, 40, 7L, spec: _*).collect().toSeq
    val c = RandFrame.df(spark, 40, 8L, spec: _*).collect().toSeq
    assert(a === b)
    assert(a !== c)
  }

  test("valuesSql renders the identical rows (parsed back via Spark SQL)") {
    // DuckDB isn't available in-test; Spark parsing the same VALUES text
    // still proves the text round-trips the generated values exactly —
    // the remaining DuckDB-vs-Spark parse agreement is standard IEEE/ISO
    // literal parsing, exercised by the driver's rf* oracle runs
    val small = Seq(ColSpec("i", CInt, 2), ColSpec("f", CFloat, 2),
      ColSpec("s", CStr, 1), ColSpec("t", CDateTime, 2))
    val df = RandFrame.df(spark, 10, 123L, small: _*)
    val sql = RandFrame.valuesSql(10, 123L, small: _*)
      .replace("TIMESTAMP '", "TIMESTAMP_NTZ '") // Spark literal keyword
      .replace("AS VARCHAR", "AS STRING")        // Spark needs a length on VARCHAR
      .replace("AS TIMESTAMP)", "AS TIMESTAMP_NTZ)")
    val parsed = spark.sql(
      s"SELECT CAST(i AS BIGINT) i, CAST(f AS DOUBLE) f, s, t FROM $sql")
    val key = (r: org.apache.spark.sql.Row) => r.toSeq.map(String.valueOf).mkString("|")
    assert(parsed.collect().map(key).sorted.toSeq ===
      df.collect().map(key).sorted.toSeq)
  }
}
