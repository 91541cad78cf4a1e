package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-quality constraint audit: evaluate a set of declarative checks
  * (completeness, uniqueness, range, set membership) over a table in ONE
  * aggregation pass — the Deequ-style shape (Schelter et al., VLDB 2018:
  * "Automating Large-Scale Data Quality Verification" — public system
  * design): every metric is an aggregate expression, so a 100 TB audit
  * costs one scan with map-side partial aggregation, never a pass per
  * check. The single metrics row is then unpivoted into one row per
  * check (bounded by the check count, not the data).
  */
object QualityAudit {

  /** One declarative check: a metric aggregate (LongType) plus the
    * integer bounds it must fall in to pass.
    */
  final case class Check(name: String, column: String, metric: Column,
      lo: Long, hi: Long)

  /** non-null count of a column (completeness numerator) */
  def completeness(c: Column): Column =
    count(when(c.isNotNull, 1L))

  /** exact distinct count (uniqueness) */
  def distinctness(c: Column): Column = count_distinct(c)

  /** rows violating a predicate (range / membership checks) */
  def violations(pred: Column): Column =
    count(when(!coalesce(pred, lit(false)), 1L))

  /** Run all checks in one aggregate pass. Output: one row per check —
    * (chk, col_name, value, lo, hi, ok) — ordered by check name. (Names
    * avoid `check`/`column`, reserved words in ANSI engines.)
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit needs at least one check")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.metric.cast(LongType).as(s"m$i")
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("chk"), lit(c.column).as("col_name"),
        col(s"m$i").as("value"), lit(c.lo).as("lo"), lit(c.hi).as("hi"))
    }
    row.select(explode(array(stacked: _*)).as("c"))
      .select(col("c.chk"), col("c.col_name"), col("c.value"),
        col("c.lo"), col("c.hi"),
        (col("c.value") >= col("c.lo") && col("c.value") <= col("c.hi"))
          .cast(IntegerType).cast(LongType).as("ok"))
      .orderBy("chk")
  }
}
