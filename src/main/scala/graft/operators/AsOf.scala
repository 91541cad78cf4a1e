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
    // payload excludes key AND time — both re-emitted under their own
    // names below (else the output carries a duplicate time column)
    val payload0 = leftCols.filter(c => c != key && c != leftTime)
    val l = left.select(
      (col(key).as("_k") +: col(leftTime).as("_t") +: lit(1).as("_side") +:
        lit(null).cast(right.schema(rightVal).dataType).as("_rv") +:
        payload0.map(col).toIndexedSeq): _*)
    val r = right.select(
      col(key).as("_k"), col(rightTime).as("_t"), lit(0).as("_side"),
      col(rightVal).as("_rv"))
    // align schemas: right side gets NULLs for the left payload columns
    val payload = payload0
    val rAligned = payload.foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    // ties (_t equal): right sorts before left, so a same-instant right
    // row is visible to the left row (inclusive as-of)
    val w = Window.partitionBy("_k").orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn("_asof", last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(
        (col("_k").as(key) +: col("_t").as(leftTime) +:
          payload.map(col).toIndexedSeq :+ col("_asof").as(s"asof_$rightVal")): _*)
  }
}
