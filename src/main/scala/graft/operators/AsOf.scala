package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Implementation is the union+window carry trick, NOT a range join: tag
  * both inputs, union them, sort within each key partition by (time,
  * right-before-left at ties), carry the right side's value with
  * `last(..., ignoreNulls)` over an unbounded-preceding frame, then keep
  * only left rows. Cost: one shuffle on the key + one within-partition
  * sort — the same shape as any windowed aggregation, so it scales like
  * one (a naive `l.ts >= r.ts` range join explodes quadratically per key
  * and cannot survive 100 TB).
  *
  * Three directions: [[join]] (backward — latest right ≤ left, the
  * DuckDB/pandas `merge_asof` default), [[joinForward]] (earliest right ≥
  * left), [[joinNearest]] (whichever side is closer in time; ties go
  * backward). All are inclusive at equal timestamps.
  */
object AsOf {

  /** the unioned, tagged frame all three directions share */
  private final case class Tagged(
      u: DataFrame, kC: String, tC: String, sideC: String, rvC: String,
      payload: Seq[String], key: String, leftTime: String)

  private def tag(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightVal: String): Tagged = {
    val leftCols = left.columns
    // internal marker names must not shadow user columns
    val Seq(kC, tC, sideC, rvC) = Cols.fresh(
      Seq("_k", "_t", "_side", "_rv"), leftCols ++ right.columns)
    // payload excludes key AND time — both re-emitted under their own
    // names below (else the output carries a duplicate time column)
    val payload = leftCols.filter(c => c != key && c != leftTime).toSeq
    // the carried value rides inside a struct so that "no right row yet"
    // (NULL struct, skipped by ignoreNulls) stays distinct from "latest
    // right row carries a NULL value" (non-NULL struct, NULL field) —
    // last() on the bare value column would skip the latter and resurrect
    // a stale older value. The struct also carries the matched right
    // TIME, which `joinNearest` needs for its distance comparison.
    val rvType = new org.apache.spark.sql.types.StructType()
      .add("v", right.schema(rightVal).dataType)
      .add("t", right.schema(rightTime).dataType)
    val l = left.select(
      (col(key).as(kC) +: col(leftTime).as(tC) +: lit(1).as(sideC) +:
        lit(null).cast(rvType).as(rvC) +:
        payload.map(col).toIndexedSeq): _*)
    val r = right.select(
      col(key).as(kC), col(rightTime).as(tC), lit(0).as(sideC),
      struct(col(rightVal).as("v"), col(rightTime).as("t")).as(rvC))
    // align schemas: right side gets NULLs for the left payload columns
    val rAligned = payload.foldLeft(r) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    Tagged(l.unionByName(rAligned), kC, tC, sideC, rvC, payload, key, leftTime)
  }

  /** carry column for one direction over the tagged union. Backward:
    * ascending time, right-before-left at ties (inclusive as-of), latest
    * preceding right row. Forward: descending time, same tie rule —
    * "last preceding in descending order" = earliest following.
    */
  private def carry(t: Tagged, forward: Boolean): Column = {
    val ord = if (forward) col(t.tC).desc else col(t.tC).asc
    val w = Window.partitionBy(t.kC).orderBy(ord, col(t.sideC))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last(col(t.rvC), ignoreNulls = true).over(w)
  }

  private def finish(t: Tagged, asof: Column, rightVal: String): DataFrame = {
    val asofC = Cols.fresh("_asof", t.u.columns)
    t.u.withColumn(asofC, asof)
      .filter(col(t.sideC) === 1)
      .select(
        (col(t.kC).as(t.key) +: col(t.tC).as(t.leftTime) +:
          t.payload.map(col).toIndexedSeq :+
          col(asofC).getField("v").as(s"asof_$rightVal")): _*)
  }

  /** For each left row, attach `rightVal` from the latest right row with
    * the same `key` and `rightTime <= leftTime` (NULL when none).
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightVal: String): DataFrame = {
    val t = tag(left, right, key, leftTime, rightTime, rightVal)
    finish(t, carry(t, forward = false), rightVal)
  }

  /** Forward as-of: `rightVal` from the EARLIEST right row with
    * `rightTime >= leftTime` (NULL when none).
    */
  def joinForward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightVal: String): DataFrame = {
    val t = tag(left, right, key, leftTime, rightTime, rightVal)
    finish(t, carry(t, forward = true), rightVal)
  }

  /** Nearest as-of: the right row minimizing |rightTime - leftTime|;
    * equal distances resolve backward (earlier right row). One shuffle,
    * two within-partition sorts (ascending + descending window).
    */
  def joinNearest(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightVal: String): DataFrame = {
    val t = tag(left, right, key, leftTime, rightTime, rightVal)
    val b = carry(t, forward = false)
    val f = carry(t, forward = true)
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val nearest = when(b.isNull, f).when(f.isNull, b)
      .when(us(col(t.tC)) - us(b.getField("t"))
        <= us(f.getField("t")) - us(col(t.tC)), b)
      .otherwise(f)
    finish(t, nearest, rightVal)
  }
}
