package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic epoch shuffle for training-data pipelines: a seeded
  * pseudorandom permutation of the corpus plus fixed-size batch packing
  * ("shuffle each epoch, cut into batches"). Everything is a pure
  * function of (id, epoch), so a re-run — or a second engine (the DuckDB
  * oracle) — reproduces the identical permutation; no RNG state.
  *
  * Scale design: the permutation is one range shuffle on the hash key.
  * The exact global rank does NOT use an unpartitioned window (a
  * single-partition sort is the classic 100 TB scale-killer); it is the
  * two-pass count-then-offset scheme — count rows per range partition
  * (one #partitions-sized job result to the driver), then assign
  * offset + local index per partition. `zipWithIndex` runs both passes
  * over the SAME materialized lineage, which matters: repartitionByRange
  * samples its bounds per instantiation, so evaluating the sorted frame
  * twice (e.g. once for counts, once for ranks) could see different
  * boundaries and mis-rank boundary rows.
  */
object EpochShuffle {

  /** Lehmer permutation key: (id mod p) · 48271^epoch mod p over the
    * Mersenne prime p = 2^31−1. The epoch enters MULTIPLICATIVELY — an
    * additive seed would shift every key uniformly and leave the sort
    * order (hence the permutation) unchanged. The epoch-multiplier is
    * folded to a literal here, so the key is one BIGINT expression whose
    * intermediates stay under 2^62 — any engine (the DuckDB oracle
    * included) replays it exactly; no engine-specific hash, no RNG. Ids
    * congruent mod p collide; orderings that use the key break ties on
    * the id itself, keeping the permutation total. epoch ≥ 1 (epoch 0 is
    * the identity multiplier).
    */
  def permKey(id: Column, epoch: Int): Column = {
    require(epoch >= 1, s"epoch must be >= 1, got $epoch")
    ((id % 2147483647L) * lit(epochMultiplier(epoch))) % 2147483647L
  }

  /** 48271^epoch mod (2^31−1), the literal the oracle SQL inlines */
  def epochMultiplier(epoch: Int): Long = {
    var m = 1L
    for (_ <- 1 to epoch) m = (m * 48271L) % 2147483647L
    m
  }

  /** Exact global row_number 1..n over `order` (must be a total order —
    * include a unique tiebreak) without a global single-partition sort.
    */
  def globalRank(df: DataFrame, order: Seq[Column], rankCol: String,
      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val sorted = df.repartitionByRange(n, order: _*).sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex.map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }

  /** One training epoch: permute by (id, epoch), rank, pack into
    * fixed-size batches. Every batch except the last has exactly
    * `batchSize` rows; batch membership is deterministic per epoch.
    */
  def epoch(df: DataFrame, idCol: String, epochNo: Int, batchSize: Int,
      partitions: Int = 0): DataFrame =
    globalRank(df.withColumn("__perm", permKey(col(idCol), epochNo)),
      Seq(col("__perm").asc_nulls_first, col(idCol).asc_nulls_first),
      "rank", partitions)
      .withColumn("batch_id", expr(s"(rank - 1) div $batchSize"))
      .drop("__perm")
}
