package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Feature-engineering operators over grouped numeric columns. Both are
  * two-pass shapes: one hash aggregate computes per-group stats (exact
  * integer sums — deterministic under any partitioning), the stats
  * broadcast back into a projection over the scan. No window over raw
  * rows, no shuffle of the fact table.
  */
object Features {

  /** Winsorization: clip the `v_c` (integer cents) column to the [pLo,
    * pHi] percentiles of its group (percentiles over exact integer
    * cents, bounds rounded to cents). Returns per-group (n, sum of
    * clipped cents, clip bounds).
    */
  def winsorizeStats(df: DataFrame, groupCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    val stats = df.groupBy(col(groupCol))
      .agg(expr(s"CAST(ROUND(percentile(v_c, $pLo)) AS BIGINT)").as("lo_c"),
        expr(s"CAST(ROUND(percentile(v_c, $pHi)) AS BIGINT)").as("hi_c"))
    df.join(broadcast(stats), Seq(groupCol))
      .withColumn("clipped", least(greatest(col("v_c"), col("lo_c")), col("hi_c")))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), sum(col("clipped")).as("sum_clipped_c"),
        min(col("lo_c")).as("lo_c"), min(col("hi_c")).as("hi_c"))
  }

  /** Deterministic z-score in permille: z = (v·n − Σv) / sqrt(n·Σv² −
    * (Σv)²) — all inputs exact integers, so the only float ops are one
    * sqrt and one divide on identical operands in any engine. Returns
    * per-(group, z-bucket) counts; bucket = floor(z_pm / bucketPm).
    */
  def zBucketCounts(df: DataFrame, groupCol: String, bucketPm: Long): DataFrame = {
    // Sums and their products run in Decimal(38,0): zn·Σv² wraps int64 at
    // ~1e9 rows/group of 4-digit cents (observed at a 60M-row replica —
    // non-ANSI Spark wraps SILENTLY and the variance filter emptied the
    // whole result, while DuckDB's SUM promotes to HUGEINT and survived).
    // Decimal keeps the arithmetic exact to 1e38, same values at every
    // scale either engine can hold; only sqrt/divide touch floats.
    val dec = DecimalType(38, 0)
    val stats = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast(dec).as("zn"),
        sum(col("v_c").cast(dec)).as("s1"),
        sum((col("v_c") * col("v_c")).cast(dec)).as("s2"))
      .filter(col("zn") * col("s2") > col("s1") * col("s1")) // nonzero variance
    df.join(broadcast(stats), Seq(groupCol))
      .withColumn("z_pm",
        round((col("v_c").cast(dec) * col("zn") - col("s1")).cast(DoubleType) * 1000.0 /
          sqrt((col("zn") * col("s2") - col("s1") * col("s1")).cast(DoubleType)))
          .cast(LongType))
      .withColumn("z_bucket", floor(col("z_pm").cast(DoubleType) / bucketPm).cast(LongType))
      .groupBy(col(groupCol), col("z_bucket"))
      .agg(count(lit(1)).as("n"))
  }
}
