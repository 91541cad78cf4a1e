package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Robust per-key outlier detection: flag rows whose deviation from
  * their key's MEDIAN exceeds `k` × the key's MAD (median absolute
  * deviation) — the standard robust alternative to mean/stddev z-scores,
  * immune to the outliers it is hunting (a single huge value shifts a
  * mean arbitrarily but moves a median one rank).
  *
  * Exactness across engines: all statistics are computed in CENTS
  * (exact longs), and `percentile(…, 0.5)` interpolation over longs
  * (and over the `.0`/`.5` deviation doubles) produces exact dyadic
  * rationals — so median, MAD, and the `|x−med| > k·MAD` comparison are
  * bit-identical in any engine, no rounding tricks needed.
  *
  * Scale shape: three passes over the input, zero raw-row shuffles —
  * the median and MAD aggregates partial-aggregate map-side, and the
  * per-key stats frames (one row per key) broadcast back into the
  * filter pass. Exact per-key `percentile` buffers each group's values;
  * for groups beyond executor memory swap in `approx_percentile` (same
  * plan shape, sketch-sized state) and keep the comparison rounded.
  */
object Robust {

  /** Rows of `df` whose `valCol` is a MAD outlier within its `keyCol`
    * group, with the group's median/mad (dollars) attached. Groups with
    * MAD = 0 (over half the values identical) flag any deviation. */
  def madOutliers(df: DataFrame, keyCol: String, valCol: String,
      k: Double = 3.0): DataFrame = {
    val cents = round(col(valCol) * 100).cast(LongType).as("_c")
    val base = df.withColumn("_c", cents)
    val med = base.groupBy(col(keyCol))
      .agg(expr("percentile(_c, 0.5)").as("_medc"))
    val mad = base.join(broadcast(med), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(expr("percentile(abs(_c - _medc), 0.5)").as("_madc"))
    base.join(broadcast(med), Seq(keyCol))
      .join(broadcast(mad), Seq(keyCol))
      .filter(abs(col("_c") - col("_medc")) > lit(k) * col("_madc"))
      .withColumn("med", col("_medc") / 100.0)
      .withColumn("mad", col("_madc") / 100.0)
      .drop("_c", "_medc", "_madc")
  }
}
