package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regular-grid resampling with gap interpolation — the time-series
  * "resample + interpolate" operator (pandas `resample().interpolate()`,
  * Flink/QuestDB gap-fill): bucket irregular observations onto a fixed
  * grid per key, then fill empty buckets by linear interpolation or
  * forward fill between the surrounding observed buckets.
  *
  * RAW ROWS NEVER SHUFFLE: every scan is reduced map-side before its
  * exchange. Catalyst compiles this to two pruned columnar scans of the
  * input — the value branch partial-aggregates per (key,bucket) before
  * shuffling (and (key,bucket) as the shuffle key spreads hot keys
  * across their buckets — no single-key hot partition), while the
  * grid-span branch collapses `min/max(bucket) per key` onto a
  * two-column scan with its own partial agg. What crosses the wire is
  * per-key partials, smaller than the input by the
  * observations-per-bucket factor. Downstream — the `sequence`/`explode`
  * grid, the grid⋈observed join, the fill windows — operates on the
  * bucketed frame only, and the windows reuse the key partitioning
  * (partition-local sort, no extra exchange). Grid generation is
  * `sequence(lo, hi)` per key — distributed, never a driver-side range.
  * Plan-guarded in PlanQualitySpec.
  *
  * Determinism across engines: the per-bucket mean is `Σcents / 100 / n`
  * with the cents sum an exact long (the engine-wide money trick), so
  * the mean — and every interpolation expression derived from it — is
  * the identical IEEE double in any engine; outputs round to 6 decimals.
  * Bucket ids are exact: `(µs − (µs mod w)) / w` divides an exact
  * multiple, so the double quotient is the integer itself.
  *
  * Ref: the reference has no time-series surface (slide/utils.py is a
  * row-kernel layer); north-star addition per BASELINE.json.
  */
object Timeseries {

  /** exact floor-division of epoch micros into bucket index */
  private def bucketIdx(micros: Column, widthMicros: Long): Column =
    ((micros - pmod(micros, lit(widthMicros))) / lit(widthMicros))
      .cast(LongType)

  /** Resample `valCol` (money-scaled doubles) onto a `widthMicros` grid
    * per `keyCol`, bucket value = mean of the bucket's observations,
    * gaps filled by `method` ("linear" or "ffill"). Output: (key,
    * bucket long index, value double rounded to 6dp, interpolated flag).
    */
  def resample(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, widthMicros: Long,
      method: String = "linear"): DataFrame = {
    require(method == "linear" || method == "ffill",
      s"resample: unknown fill method '$method'")
    val keyed = df
      .select(col(keyCol), unix_micros(col(tsCol).cast(TimestampType)).as("_us"),
        round(col(valCol) * 100).cast(LongType).as("_c"))
    val obs = keyed
      .groupBy(col(keyCol), bucketIdx(col("_us"), widthMicros).as("bucket"))
      .agg((sum("_c") / 100.0 / count(lit(1))).as("_v"))
    val grid = obs.groupBy(col(keyCol))
      .agg(min("bucket").as("_lo"), max("bucket").as("_hi"))
      .select(col(keyCol), explode(sequence(col("_lo"), col("_hi"))).as("bucket"))
    val j = grid.join(obs, Seq(keyCol, "bucket"), "left")
    val wAsc = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(keyCol).orderBy("bucket")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pv = last(col("_v"), ignoreNulls = true).over(wAsc)
    val pb = last(when(col("_v").isNotNull, col("bucket")), ignoreNulls = true).over(wAsc)
    val nv = first(col("_v"), ignoreNulls = true).over(wDesc)
    val nb = first(when(col("_v").isNotNull, col("bucket")), ignoreNulls = true).over(wDesc)
    val filled = method match {
      case "linear" =>
        when(col("_v").isNotNull, col("_v"))
          .when(pv.isNotNull && nv.isNotNull,
            pv + (nv - pv) * (col("bucket") - pb).cast(DoubleType) /
              (nb - pb).cast(DoubleType))
          .otherwise(coalesce(pv, nv))
      case "ffill" => coalesce(col("_v"), pv, nv)
    }
    j.select(col(keyCol), col("bucket"),
      round(filled, 6).as("value"),
      col("_v").isNull.as("interpolated"))
  }
}
