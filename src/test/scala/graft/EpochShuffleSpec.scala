package graft

import org.apache.spark.sql.functions._
import graft.operators.EpochShuffle
import graft.sources.Tables

/** Epoch shuffle: the rank must be an exact permutation of 1..n computed
  * without a global single-partition sort, deterministic per (id, epoch),
  * different across epochs, and the batch cut exact.
  */
class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.load(spark, sf, "documents").select("doc_id")

  test("rank is a bijection onto 1..n, stable across runs") {
    val n = docs.count()
    val e = EpochShuffle.epoch(docs, "doc_id", epochNo = 3, batchSize = 10,
      partitions = 7).cache()
    val stats = e.agg(count(lit(1)), countDistinct("rank"),
      min("rank"), max("rank")).head()
    assert(stats.getLong(0) === n && stats.getLong(1) === n)
    assert(stats.getLong(2) === 1L && stats.getLong(3) === n)
    val again = EpochShuffle.epoch(docs, "doc_id", epochNo = 3, batchSize = 10,
      partitions = 7)
    assert(e.select("doc_id", "rank").collect().toSet ===
      again.select("doc_id", "rank").collect().toSet)
    e.unpersist()
  }

  test("multi-partition ranking equals the single-partition ground truth") {
    // 7 range partitions vs partitions=1 (where offset logic is trivially
    // right): identical assignment — the cross-partition offsets are exact
    val one = EpochShuffle.epoch(docs, "doc_id", 1, 16, partitions = 1)
    val many = EpochShuffle.epoch(docs, "doc_id", 1, 16, partitions = 7)
    assert(many.collect().toSet === one.collect().toSet)
  }

  test("epochs produce different permutations; batches are exactly sized") {
    val e1 = EpochShuffle.epoch(docs, "doc_id", 1, 64)
    val e2 = EpochShuffle.epoch(docs, "doc_id", 2, 64)
    val moved = e1.as("a").join(e2.as("b"), "doc_id")
      .filter(col("a.rank") =!= col("b.rank")).count()
    assert(moved > 0, "epoch seed had no effect on the permutation")
    val n = docs.count()
    val sizes = e1.groupBy("batch_id").count()
      .orderBy("batch_id").collect().map(_.getLong(1))
    assert(sizes.init.forall(_ === 64L))
    assert(sizes.last === (if (n % 64 == 0) 64L else n % 64))
    assert(sizes.map(_.toLong).sum === n)
  }

  test("no single-partition global sort in the plan") {
    val e = EpochShuffle.epoch(docs, "doc_id", 1, 64, partitions = 7)
    // rank assignment happens on the range-partitioned RDD — the frame
    // itself keeps those partitions, and nothing upstream coalesced to 1
    assert(e.rdd.getNumPartitions === 7)
  }

  test("hash stays in safe 64-bit range for adversarial ids") {
    val ids = Seq(0L, 1L, Long.MaxValue, 2147483646L, 2147483647L,
      4294967296L, 999999999999L).toDF("doc_id")
    val ranked = EpochShuffle.epoch(ids, "doc_id", 5, 2, partitions = 3)
    val ranks = ranked.select("rank").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq === (1L to 7L))
    // permutation key itself is non-negative and below the prime
    val keys = ids.select(EpochShuffle.permKey(col("doc_id"), 5).as("h"))
      .collect().map(_.getLong(0))
    assert(keys.forall(h => h >= 0 && h < 2147483647L))
  }
}
