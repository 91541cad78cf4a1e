package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * `df.sample()` draws per-partition Bernoulli samples — results change
  * with partitioning, retries, and cluster size, which is unacceptable in
  * a data pipeline that must be reproducible and auditable. These
  * operators derive membership from row *content*, so the same row makes
  * the same decision on any cluster at any scale.
  */
object Sampling {

  /** Keep rows whose bucket (of `buckets`) falls below `keep` — a
    * keep/buckets fraction. Pass `xxhash64(idCol)` as the bucket column
    * for a uniform content hash, or any deterministic expression for
    * custom stratification (e.g. a modulo for oracle-checkable tests).
    */
  def bucketSample(df: DataFrame, bucket: Column, buckets: Int, keep: Int): DataFrame = {
    require(buckets > 0 && keep >= 0 && keep <= buckets, "0 <= keep <= buckets")
    df.filter(pmod(bucket, lit(buckets)) < keep)
  }

  /** At most `n` rows per group, chosen by a deterministic order — the
    * "cap examples per domain/source" pipeline primitive. One shuffle on
    * the group key.
    */
  def stratifiedLimit(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[Column], n: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(orderCols: _*)
    val rn = Cols.fresh("_rn", df.columns)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= n)
      .drop(rn)
  }
}
