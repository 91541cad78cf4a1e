package graft

import org.apache.spark.sql.functions._
import graft.operators.Features

/** Regression: zBucketCounts must survive sums whose products exceed
  * int64 (zn·Σv² wraps at ~1e9 rows of 4-digit cents; observed on a
  * 60M-row replica where non-ANSI Spark wrapped SILENTLY, the variance
  * filter went false, and the whole result emptied). The planted group
  * here reaches zn·Σv² ≈ 6e21 with only 60k rows by using large cents
  * values — small enough for a unit test, far past the wrap.
  */
class FeaturesOverflowSpec extends SparkSpec {
  import spark.implicits._

  test("z-bucket stats survive int64-overflowing sum products") {
    val n = 60000
    // v_c alternates around 1e7 so variance is nonzero and Σv² ≈ 6e18·n
    val df = (1 to n).map(i => ("g", 10000000L + (i % 3) * 1000L))
      .toDF("k", "v_c")
    val out = Features.zBucketCounts(df, "k", bucketPm = 500L)
      .collect()
    assert(out.nonEmpty, "variance filter emptied the result — overflow is back")
    assert(out.map(_.getLong(2)).sum == n.toLong) // every row bucketed
  }

  test("small-scale values are unchanged by the decimal internals") {
    val df = Seq(("a", 100L), ("a", 200L), ("a", 300L),
      ("b", 5L), ("b", 5L)).toDF("k", "v_c")
    val rows = Features.zBucketCounts(df, "k", bucketPm = 500L)
      .orderBy("k", "z_bucket")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // group a: z of (100,200,300) with mean 200, sd via integer sums:
    // z_pm = ±1224 -> buckets -3 and 2, middle value 0 -> bucket 0
    assert(rows == Seq(("a", -3L, 1L), ("a", 0L, 1L), ("a", 2L, 1L)))
    // group b: zero variance -> filtered out entirely
    assert(!rows.exists(_._1 == "b"))
  }
}
