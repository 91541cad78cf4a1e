package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Implementation is the union+window carry-forward trick, NOT a range
  * join: tag both inputs, union them, sort within each key partition by
  * (time, right-before-left at ties), carry the right side's latest values
  * forward with `last(..., ignoreNulls)` over an unbounded-preceding
  * frame, then keep only left rows. Cost: one shuffle on the key + one
  * within-partition sort — the same shape as any windowed aggregation, so
  * it scales like one (a naive `l.ts >= r.ts` range join explodes
  * quadratically per key and cannot survive 100 TB).
  */
object AsOf {

  /** For each left row, attach `rightVal` from the latest right row with
    * the same `key` and `rightTime <= leftTime` (NULL when none).
    *
    * @param left      probe side
    * @param right     reference side (e.g. quotes, config versions)
    * @param key       equi-key column name present on both sides
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param rightVal  value column on `right` to carry
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightVal: String): DataFrame = {
    val leftCols = left.columns
    // internal marker names must not shadow user columns
    val Seq(kC, tC, sideC, rvC, asofC) = Cols.fresh(
      Seq("_k", "_t", "_side", "_rv", "_asof"), leftCols ++ right.columns)
    // payload excludes key AND time — both re-emitted under their own
    // names below (else the output carries a duplicate time column)
    val payload0 = leftCols.filter(c => c != key && c != leftTime)
    // the carried value rides inside a struct so that "no right row yet"
    // (NULL struct, skipped by ignoreNulls) stays distinct from "latest
    // right row carries a NULL value" (non-NULL struct, NULL field) —
    // last() on the bare value column would skip the latter and resurrect
    // a stale older value
    val rvType = new org.apache.spark.sql.types.StructType()
      .add("v", right.schema(rightVal).dataType)
    val l = left.select(
      (col(key).as(kC) +: col(leftTime).as(tC) +: lit(1).as(sideC) +:
        lit(null).cast(rvType).as(rvC) +:
        payload0.map(col).toIndexedSeq): _*)
    val r = right.select(
      col(key).as(kC), col(rightTime).as(tC), lit(0).as(sideC),
      struct(col(rightVal).as("v")).as(rvC))
    // align schemas: right side gets NULLs for the left payload columns
    val payload = payload0
    val rAligned = payload.foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    // ties (_t equal): right sorts before left, so a same-instant right
    // row is visible to the left row (inclusive as-of)
    val w = Window.partitionBy(kC).orderBy(col(tC), col(sideC))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn(asofC, last(col(rvC), ignoreNulls = true).over(w))
      .filter(col(sideC) === 1)
      .select(
        (col(kC).as(key) +: col(tC).as(leftTime) +:
          payload.map(col).toIndexedSeq :+
          col(asofC).getField("v").as(s"asof_$rightVal")): _*)
  }
}
