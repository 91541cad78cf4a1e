package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed global prefix sum — the scan primitive behind sequence
  * packing (concat-then-chunk into fixed token windows), shard boundary
  * assignment, and byte-offset planning, done WITHOUT the single-
  * partition `Window.orderBy` that a naive cumulative sum compiles to.
  *
  * Two passes over a range-sorted frame (the SetSimJoin vocabulary-rank
  * pattern, generalized):
  *
  *   1. sort by the order column (distributed range partition sort);
  *      one tiny job collects the per-partition value totals — a
  *      #partitions-sized array, not data;
  *   2. a per-partition pass re-walks the sorted partitions adding the
  *      broadcast partition offsets.
  *
  * The result is the exact global running sum in `orderCol` order,
  * independent of where the range boundaries landed, because addition is
  * associative and the order is total (callers pass a unique key). At
  * 100 TB this is the textbook two-phase scan: the only global
  * synchronization is the #partitions-row totals exchange.
  *
  * The sort lineage is evaluated twice (totals pass + output pass); both
  * runs share one deterministic plan, and recomputing a sort beats
  * persisting a 100 TB intermediate.
  */
object PrefixSum {

  /** `df` plus `offsetCol` = EXCLUSIVE prefix sum of `valueCol` (long)
    * in ascending `orderCol` order: the sum of all values strictly
    * before the row. Rows keep all original columns.
    */
  def exclusive(df: DataFrame, orderCol: String, valueCol: String,
      offsetCol: String): DataFrame = {
    val sorted = df.orderBy(col(orderCol))
    val schema = sorted.schema
    val valIdx = schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    val totals = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(valIdx))
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // offsets(i) = sum of partitions < i
    val out = rdd.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { r =>
        val v = r.getLong(valIdx)
        val row = Row.fromSeq(r.toSeq :+ acc)
        acc += v
        row
      }
    }
    df.sparkSession.createDataFrame(out,
      StructType(schema.fields :+ StructField(offsetCol, LongType, nullable = false)))
  }
}
